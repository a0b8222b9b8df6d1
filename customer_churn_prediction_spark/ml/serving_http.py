"""The literal REST serving shim over the serving bundle.

Reference parity: ``GBDT/python/churn_xgb_server.py:13-33`` serves a
Flask ``POST /predict`` that takes a JSON list of records with a user
id column and answers ``{"predictions": {id: p}}`` — re-unpickling the
model INSIDE the request handler, per request. This module is the same
wire contract on the engine's serving bundle, with the deployment
defects fixed:

- the model is the memoized bundle load (``serving.load_serving_bundle``
  — one deserialization per process, stat-revalidated per request so a
  re-exported bundle is picked up without a restart), not a per-request
  unpickle from a hard-coded home directory;
- scoring goes through the SAME ``PipelineModel.transform`` as the
  batch and streaming paths (``serving.score_records``), so the HTTP
  surface cannot skew from training;
- a malformed payload is a 400 with a message, not a raised exception
  (the reference re-raises, turning client errors into 500s).

Flask is an optional dependency probed per round (absent through r6,
present from r7); :func:`create_app` raises ``ImportError`` with the
probe context if it is missing, and everything else in ``ml/serving``
works without it — the HTTP shim is transport, not engine.

Scale note: this is the LOW-LATENCY single-record path; bulk scoring
belongs on ``serve_scoring_stream`` (per-epoch exactly-once parquet) —
an HTTP hop per row at 100 TB is the anti-pattern the streaming sink
exists to avoid.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .serving import load_serving_bundle, score_records


def flask_or_none():
    """Guarded optional import, same pattern as ``models.xgboost_or_none``."""
    try:
        import flask

        return flask
    except ImportError:
        return None


def create_app(spark: SparkSession, bundle_path: str):
    """Build the Flask app serving ``bundle_path``.

    ``POST /predict``: JSON list of records. Each record may carry an
    ``"id"`` key (the reference's USR_NUM_ID role — echoed as the
    response key, never fed to the model); records without one key by
    list position. Unknown feature keys, non-scalar feature values,
    duplicate ids (after string coercion — the response is keyed by
    id), and an empty or non-list payload are each a 400 naming the
    problem (reference's ``bad_request``).
    Response: ``{"predictions": {id: p_churn}, "export_id": ...}`` —
    the export id tells the caller exactly which model answered.

    ``GET /healthz``: the bundle manifest (request schema + export id)
    so a deployment can assert what is being served without scoring.
    """
    flask = flask_or_none()
    if flask is None:
        raise ImportError(
            "flask is not installed in this environment; the HTTP shim "
            "is optional — use serving.score_records directly"
        )
    app = flask.Flask("ccp-spark-serving")

    def _bad_request(message: str):
        resp = flask.jsonify({"status": 400, "message": message})
        resp.status_code = 400
        return resp

    @app.route("/healthz", methods=["GET"])
    def healthz():
        _, manifest = load_serving_bundle(bundle_path)
        return flask.jsonify(manifest)

    @app.route("/predict", methods=["POST"])
    def predict():
        payload = flask.request.get_json(force=True, silent=True)
        if not isinstance(payload, list) or not payload:
            return _bad_request(
                "expected a non-empty JSON list of feature records"
            )
        ids = []
        feats = []
        for i, rec in enumerate(payload):
            if not isinstance(rec, dict):
                return _bad_request(f"record {i} is not an object")
            rec = dict(rec)
            ids.append(str(rec.pop("id", i)))
            feats.append(rec)
        # The response keys a dict by id: colliding ids (two records
        # claiming the same explicit id, or an explicit id equal to
        # another record's positional index) would silently drop a
        # prediction — reject instead of misattributing a score.
        if len(set(ids)) != len(ids):
            dupes = sorted({k for k in ids if ids.count(k) > 1})
            return _bad_request(f"duplicate record ids: {dupes}")
        # ONE bundle load serves both the scores and the provenance:
        # loading again after scoring could race a concurrent re-export
        # and stamp one model's predictions with another's export_id.
        bundle = load_serving_bundle(bundle_path)
        try:
            scored = score_records(spark, bundle_path, feats, bundle=bundle)
        except (ValueError, TypeError) as e:
            # TypeError covers non-scalar feature values (nested
            # objects/lists) — a client error, not a server fault.
            return _bad_request(str(e))
        return flask.jsonify(
            {
                "predictions": {
                    k: s["p_churn"] for k, s in zip(ids, scored)
                },
                "export_id": bundle[1].get("export_id"),
            }
        )

    return app
