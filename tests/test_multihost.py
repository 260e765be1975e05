"""Multi-host (2-process ``jax.distributed``) integration test.

Spawns two real OS processes that bring up a gloo-backed CPU
``jax.distributed`` cluster (2 local devices each → 4 global), stride the
shard list per process (``ShardedDataset._assigned_shards``), assemble
their local batches into one global sharded array
(``local_batch_to_global``), and run one jitted train step. Asserts the
shard split is a disjoint cover and that both processes compute the SAME
global loss — the DDP invariant the reference gets from NCCL allreduce
(reference analog: datasets/wds_dataset.py:397-406 rank striding under
Lightning DDP).
"""

from __future__ import annotations

import io
import json
import os
import socket
import subprocess
import sys
import tarfile
from pathlib import Path

import numpy as np
import pytest

_WORKER = Path(__file__).parent / "_multihost_worker.py"
_REPO = Path(__file__).parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _write_shard(path: Path, keys: list[str]) -> None:
    with tarfile.open(path, "w") as tar:
        for key in keys:
            rng = np.random.default_rng(abs(hash(key)) % 2**32)
            img = rng.integers(0, 255, (4, 16, 16)).astype(np.uint8)
            lbl = rng.integers(0, 3, (16, 16)).astype(np.uint8)
            for field, payload in [
                ("image_patch.npy", img),
                ("label_patch.npy", lbl),
                ("metadata.json", {"metadata": {}}),
            ]:
                if field.endswith("npy"):
                    buf = io.BytesIO()
                    np.save(buf, payload)
                    raw = buf.getvalue()
                else:
                    raw = json.dumps(payload).encode()
                info = tarfile.TarInfo(f"{key}.{field}")
                info.size = len(raw)
                tar.addfile(info, io.BytesIO(raw))


@pytest.mark.slow
def test_two_process_distributed_train_step(tmp_path):
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    for s in range(4):
        _write_shard(
            shard_dir / f"shard-{s:04d}.tar", [f"k{s}_{i}" for i in range(2)]
        )
    stats = {
        "statistics": {
            "geoeye": {
                "mean": [120.0, 110.0, 100.0, 90.0],
                "std": [50.0, 50.0, 50.0, 50.0],
                "band_count": 4,
                "patch_count": 8,
                "dtype": "uint8",
            }
        }
    }
    (shard_dir / "stats.json").write_text(json.dumps(stats))

    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = str(_REPO)  # drop any sitecustomize, keep the repo
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, str(_WORKER), str(pid), f"localhost:{port}", str(shard_dir)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    results = {}
    for pid, (proc, out) in enumerate(zip(procs, outs)):
        assert proc.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, f"worker {pid} printed no RESULT:\n{out[-3000:]}"
        results[pid] = json.loads(lines[-1][len("RESULT "):])

    # disjoint cover of the shard list (rank striding)
    a0, a1 = set(results[0]["assigned"]), set(results[1]["assigned"])
    assert a0.isdisjoint(a1)
    assert a0 | a1 == {f"shard-{s:04d}.tar" for s in range(4)}
    assert results[0]["local_batch"] == results[1]["local_batch"] == 4
    assert results[0]["global_batch"] == results[1]["global_batch"] == 8
    # the jitted step reduces over the GLOBAL batch: identical loss everywhere
    np.testing.assert_allclose(results[0]["loss"], results[1]["loss"], rtol=1e-6)
    assert np.isfinite(results[0]["loss"])
