"""Committed-evidence helper: audit copies of protocol results.

``output/`` is gitignored (checkpoints, logs, visualizations — large and
machine-local), which round 4 learned the hard way makes every published
accuracy number an unauditable doc assertion once the directory is gone.
Protocol runs therefore ALSO write their (KB-scale) result JSONs to the
committed ``results/`` tree via ``--results-out`` (cli.test, cli.track)
or directly (bench wrappers, studies), wrapped with enough metadata to
re-run the measurement: the argv, config experiment, and git revision.
README tables cite these paths.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def record_result(path: str, payload, experiment: str = "",
                  argv: list[str] | None = None) -> None:
    """Write ``payload`` (any JSON-serializable result dict) to ``path``
    wrapped with run metadata.  Creates parent directories."""
    meta = {
        "experiment": experiment,
        "argv": list(sys.argv[1:] if argv is None else argv),
        "recorded_unix": int(time.time()),
        "git": _git_rev(),
        "results": payload,
    }
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    with open(path, "w") as f:
        json.dump(meta, f, indent=2)
    print(f"recorded results -> {path}")


def _git_rev() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))),
            capture_output=True, text=True, timeout=5,
        ).stdout.strip()
    except Exception:
        return ""
