"""End-to-end example: prove the fib guest and verify the proof.

Counterpart of the reference host flow
(`/root/reference/sdk/examples/stwo_instrument.rs`): load guest,
prove with input, inspect the View, verify, serialize.

    python examples/prove_fib.py [n] [--cpu]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

from nexus_zkvm_tpu.sdk import (  # noqa: E402
    Guest, LocalProver, encode_u32s, decode_u32s, proof_to_bytes,
)

n = next((int(a) for a in sys.argv[1:] if a.isdigit()), 20)

guest = Guest.from_asm(open(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "guests",
    "fib.s")).read())
prover = LocalProver(guest)

t0 = time.time()
view, proof = prover.prove_with_input(public_input=encode_u32s(n))
t_prove = time.time() - t0
print(f"fib({n}) = {decode_u32s(view.public_output, 1)[0]}")
print(f"exit code: {view.exit_code}")
print(f"proved in {t_prove:.1f}s, "
      f"proof ~{len(proof_to_bytes(proof)) / 1024:.0f} KiB")

t0 = time.time()
ok = prover.verify(view, proof)
print(f"verified: {ok} in {time.time() - t0:.1f}s")
assert ok
