"""Rule-spec loading: the reference's GCS schema bucket as a local JSON dir.

Maps SURVEY.md §2.1 S3/S4/S5: ``loadJsonFromGCS`` fetches ``<event_name>.json``
per request with 404→None (validator_src/helpers/cloudHelpers.js:12-23);
``listAllSchemas`` lists the bucket filtering ``*.json``
(streamlit_ev/app/helpers/gcp.py:92-101). Here the whole rule corpus loads
once on the driver (it is tiny — rule specs, not data) and rides into compiled
Column expressions; Spark broadcasts the closures to executors for free. The
parameter repository (repo.json) loads the same way.
"""

from __future__ import annotations

import glob
import json
import os


def load_rules(path: str) -> dict | None:
    """One rule spec; missing file → None (the reference's 404 → null)."""
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def load_rules_dir(dir_path: str) -> dict[str, dict]:
    """All ``*.json`` rule specs in a directory, keyed by event name
    (the file stem, exactly as the reference keys its bucket objects)."""
    out: dict[str, dict] = {}
    for p in sorted(glob.glob(os.path.join(dir_path, "*.json"))):
        name = os.path.splitext(os.path.basename(p))[0]
        if name == "repo":  # the parameter repository is not an event schema
            continue
        with open(p) as f:
            out[name] = json.load(f)
    return out


def load_repo(dir_path: str) -> dict | None:
    """The parameter repository (repo.json) if present."""
    return load_rules(os.path.join(dir_path, "repo.json"))
