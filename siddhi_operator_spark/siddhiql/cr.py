"""SiddhiProcess custom-resource front door — SURVEY.md §4.2 entry
point B. The reference's literal user input is a Kubernetes CR
(`apiVersion: siddhi.io/v1alpha2, kind: SiddhiProcess`) whose
`spec.apps[*].script` entries carry the SiddhiQL app text (the
operator's Reconcile() posts them to the parser service and mounts
them into runner pods as ConfigMaps). Here the same YAML hands its
scripts straight to `run_app`/`run_app_streaming` — a user's existing
`kubectl apply` manifest runs with
`python -m siddhi_operator_spark run-cr process.yaml`.

Kubernetes-side concerns (Deployments, Services, NATS CRs, PVCs) are
out of engine scope by design; `spec.apps[*].configMap` references are
rejected with a clear error since there is no cluster to resolve them
against — inline `script` entries and the legacy `spec.query` field
are the supported shapes.
"""

from __future__ import annotations


def load_cr_scripts(text: str) -> list[str]:
    """Extract the SiddhiQL scripts from a SiddhiProcess CR YAML.

    Supported: `spec.apps: [{script: "..."}]` (v1alpha2) and the
    legacy single `spec.query: "..."` (v1alpha1). A `configMap` app
    reference raises — it points at cluster state we don't have.
    """
    import yaml

    doc = yaml.safe_load(text)
    if not isinstance(doc, dict):
        raise ValueError("not a YAML mapping — expected a SiddhiProcess CR")
    kind = doc.get("kind")
    if kind != "SiddhiProcess":
        raise ValueError(f"kind is {kind!r}, expected 'SiddhiProcess'")
    spec = doc.get("spec") or {}
    scripts: list[str] = []
    for i, app in enumerate(spec.get("apps") or []):
        if not isinstance(app, dict):
            raise ValueError(f"spec.apps[{i}] is not a mapping")
        if "script" in app:
            scripts.append(app["script"])
        elif "configMap" in app:
            raise ValueError(
                f"spec.apps[{i}] references ConfigMap "
                f"{app['configMap']!r} — mount it yourself and pass the "
                ".siddhi file to `run`, or inline it as `script:`"
            )
        else:
            raise ValueError(f"spec.apps[{i}] has neither script nor configMap")
    if not scripts and spec.get("query"):
        scripts.append(spec["query"])
    if not scripts:
        raise ValueError("CR carries no apps (spec.apps[].script or spec.query)")
    return scripts
