"""TRUE multi-process comm-backend test (SURVEY §2.2 comm row): two OS
processes form one JAX fleet over CPU devices with gloo collectives —
`parallel.distributed.initialize` wiring, cross-process psum/ppermute,
and a row-sharded render whose output spans both processes (each checks
its addressable rows against the oracle). The single-process smoke test
in test_sharding.py covers the idempotency path; this one covers the
actual multi-host topology the module exists for."""

import pathlib
import socket
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent


def test_two_process_fleet_collectives_and_sharded_render():
    # bounded by communicate(timeout=220) below — no plugin needed
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"127.0.0.1:{port}"

    import os

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # the workers force the CPU platform themselves (jax.config)
    procs = [
        subprocess.Popen(
            [sys.executable, str(ROOT / "tests" / "_mp_worker.py"),
             str(i), coord],
            cwd=ROOT, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=220)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        tail = "\n".join(out.splitlines()[-15:])
        assert p.returncode == 0, f"worker {i} failed:\n{tail}"
        assert f"pid{i}: collectives OK" in out, tail
        assert f"pid{i}: sharded render OK" in out, tail
