"""Environment fingerprinting (reference pyskl/utils/collect_env.py):
record library versions + device topology into logs/checkpoints for
reproducibility."""
from __future__ import annotations

import platform
import subprocess
import sys
from typing import Dict


def collect_env() -> Dict[str, str]:
    info = {
        "python": sys.version.split()[0],
        "platform": platform.platform(),
    }
    for mod in ("jax", "jaxlib", "flax", "optax", "numpy"):
        try:
            m = __import__(mod)
            info[mod] = getattr(m, "__version__", "?")
        except Exception:
            info[mod] = "absent"
    try:
        import jax
        devs = jax.devices()
        info["devices"] = f"{len(devs)}x {devs[0].device_kind}" if devs else "none"
        info["process_count"] = str(jax.process_count())
    except Exception as e:
        info["devices"] = f"error: {e}"
    try:
        sha = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True, timeout=5)
        if sha.returncode == 0:
            info["git"] = sha.stdout.strip()
    except Exception:
        pass
    return info
