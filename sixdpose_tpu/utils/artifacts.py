"""Self-describing benchmark/accuracy artifacts.

Round-2 verdict: a stale SYNTH JSON was presented as the post-fix run
because nothing tied artifacts to the code that produced them.  Every
ACCURACY/SYNTH/BENCH JSON now carries the git revision, dirty flag,
backend, and the exact flags it was produced with, so provenance is
checkable instead of asserted.
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys
from typing import Optional


def git_rev(repo_dir: Optional[str] = None) -> dict:
    """Current commit hash + dirty flag (empty strings if not a repo)."""
    repo_dir = repo_dir or os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    try:
        rev = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=repo_dir, capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        dirty = bool(
            subprocess.run(
                ["git", "status", "--porcelain"],
                cwd=repo_dir, capture_output=True, text=True, timeout=10,
            ).stdout.strip()
        )
        return {"rev": rev, "dirty": dirty}
    except Exception:
        return {"rev": "", "dirty": False}


def provenance(config: Optional[dict] = None) -> dict:
    """Stamp dict: git rev, UTC time, argv, JAX backend, config flags."""
    try:
        import jax

        backend = jax.default_backend()
        devices = [str(d) for d in jax.devices()]
    except Exception:
        backend, devices = "", []
    return {
        "git": git_rev(),
        "generated_utc": datetime.datetime.now(
            datetime.timezone.utc
        ).isoformat(timespec="seconds"),
        "argv": sys.argv,
        "backend": backend,
        "devices": devices,
        "config": config or {},
    }


def write_artifact(path: str, result: dict, config: Optional[dict] = None) -> dict:
    """Write ``result`` + a provenance stamp to ``path`` (JSON).  Returns
    the stamped payload."""
    payload = dict(result)
    payload["provenance"] = provenance(config)
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    return payload
