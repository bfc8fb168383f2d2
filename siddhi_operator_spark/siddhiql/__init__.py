"""SiddhiQL front end (SURVEY.md §4.1, §8.1 L3).

The reference compiles SiddhiQL with an ANTLR4 grammar
(`[qc] src/main/antlr4/.../SiddhiQL.g4` → `SiddhiCompiler.java` →
`SiddhiQLBaseVisitorImpl`) into a query object model, then into a
processor graph. Here the same pipeline is: subset parser (this
package) → app model (dataclasses) → DataFrame builder — Catalyst is
the runtime graph.

Supported subset (the shapes the reference's docs/examples exercise):
- `define stream S (a string, b double, …);` / `define table T (…);`
- `@…(…)` annotations are parsed and retained (source/sink wiring is
  the host's concern in this engine — SURVEY.md §8.5)
- queries: `from <input> select <items> [group by …] [having …]
  [order by …] [limit n] insert into Out;`
  - input: `S[filter]`, `S#window.type(args)`,
    `S1 … join S2 … on cond [within t]`,
    `every e1=S[p1] -> e2=S[p2] … [within t]`
- expressions: SiddhiQL `==` → SQL `=`; `str:`/`math:`/`time:`/
  `json:` namespaces rewritten to Spark SQL builtins; time constants
  (`5 sec`, `1 min`) to seconds.

`run_app(text, sources)` executes in batch/analytics mode (the mode
the correctness gate exercises); streaming execution reuses the same
app model with the streaming twins.
"""

from .model import AppModel, PatternStep, QueryDef, StreamDef  # noqa: F401
from .parser import parse_app  # noqa: F401
from .builder import run_app, run_app_streaming  # noqa: F401
