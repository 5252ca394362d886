"""Two-process jax.distributed smoke: DCN init + cross-process
collectives on the CPU backend.

The reference has no distributed runtime (SURVEY §2.6); this pins OUR
multi-host seam (`parallel/distributed.py`): two OS processes, one CPU
device each, form a global mesh; a globally-sharded Blake2s batch hash
and a global reduction must agree with the single-process reference.
Skips when the jaxlib build has no cross-process CPU collectives.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_CHILD = r'''
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["NZT_COORDINATOR"] = f"127.0.0.1:{port}"
os.environ["NZT_NUM_PROCESSES"] = str(n)
os.environ["NZT_PROCESS_ID"] = str(pid)
sys.path.insert(0, os.getcwd())
from nexus_zkvm_tpu.parallel.distributed import (init_distributed,
                                                 is_distributed)
try:
    info = init_distributed()
except Exception as e:                      # no multiprocess support
    print("INIT_UNSUPPORTED", repr(e)[:100], flush=True)
    sys.exit(42)
assert info["n_processes"] == n, info
assert is_distributed()

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS
from nexus_zkvm_tpu.ops.blake2s import (batch_blake2s_words,
                                        np_batch_blake2s_words)

devs = np.array(jax.devices())
assert len(devs) == n, devs
mesh = Mesh(devs, ("rows",))
sh = NamedSharding(mesh, PS("rows"))

B = 16
msgs = np.arange(B * 8, dtype=np.uint32).reshape(B, 8)
local = msgs[pid * (B // n):(pid + 1) * (B // n)]
garr = jax.make_array_from_process_local_data(sh, local, msgs.shape)

# cross-process collective: global modular-ish reduction
total = int(jax.jit(lambda x: jnp.sum(x.astype(jnp.uint64)))(garr))
assert total == int(msgs.astype(np.uint64).sum()), total

# globally sharded batch hash == host reference
out = jax.jit(batch_blake2s_words,
              out_shardings=NamedSharding(mesh, PS("rows")))(garr)
from jax.experimental import multihost_utils
full = multihost_utils.process_allgather(out, tiled=True)
want = np_batch_blake2s_words(msgs)
assert np.array_equal(np.asarray(full), want)
print("DIST_OK", flush=True)
'''


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_collectives(tmp_path):
    port = _free_port()
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    env = dict(os.environ)
    env.pop("PYTEST_CURRENT_TEST", None)
    # children manage their own device topology
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=cwd, env=env) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed children timed out")
        outs.append((p.returncode, out, err))
    if any(rc == 42 for rc, _o, _e in outs):
        pytest.skip("jaxlib lacks cross-process CPU collectives")
    for rc, out, err in outs:
        assert rc == 0, out[-1500:] + err[-1500:]
        assert "DIST_OK" in out
