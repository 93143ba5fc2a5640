"""Isolate fused-kernel cost components on TPU."""
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tod_tpu.ops.matching import popcount_rows, unpack_bits

Q, N = 5120, 262144
QT, CK = 256, 4096
rng = np.random.default_rng(0)
q8 = jnp.asarray(rng.integers(0, 256, (Q, 32), dtype=np.uint8))
db8 = jnp.asarray(rng.integers(0, 256, (N, 32), dtype=np.uint8))


def make(dtype, mode):
    q_bits = unpack_bits(q8, dtype)
    db_t = unpack_bits(db8, dtype).T
    acc = jnp.int32 if dtype == jnp.int8 else jnp.float32
    if dtype == jnp.int8:
        qp = popcount_rows(q8).astype(jnp.int32)[:, None]
        dp = popcount_rows(db8).astype(jnp.int32)[None, :]
    else:
        qp = popcount_rows(q8)[:, None]
        dp = popcount_rows(db8)[None, :]

    def kernel(qr, dr, qpr, dpr, out_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        dot = jnp.dot(qr[:], dr[:], preferred_element_type=acc)
        if mode == "dot_only":
            acc_ref[:] += dot[:, :128].astype(jnp.float32)
        else:
            dist = (qpr[:] + dpr[:] - 2 * dot).astype(jnp.int32)
            if mode == "dot_dist_min":
                acc_ref[:] += dist.min(axis=1, keepdims=True).astype(
                    jnp.float32)
            elif mode == "dot_dist_scalarmin":
                m = dist.min()
                acc_ref[0, 0] += m.astype(jnp.float32)

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            out_ref[:] = acc_ref[:]

    out_w = 128 if mode == "dot_only" else (1 if mode != "x" else 1)
    return pl.pallas_call(
        kernel,
        grid=(Q // QT, N // CK),
        in_specs=[
            pl.BlockSpec((QT, 256), lambda i, j: (i, 0)),
            pl.BlockSpec((256, CK), lambda i, j: (0, j)),
            pl.BlockSpec((QT, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, CK), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((QT, out_w), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Q, out_w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((QT, out_w), jnp.float32)],
    ), (q_bits, db_t, qp, dp)


for dtype in (jnp.int8, jnp.bfloat16):
    for mode in ("dot_only", "dot_dist_min", "dot_dist_scalarmin"):
        fn, args = make(dtype, mode)
        jfn = jax.jit(lambda *a: fn(*a))
        out = jfn(*args)
        np.asarray(out)
        t0 = time.time()
        nrep = 30
        for _ in range(nrep):
            out = jfn(*args)
        s = float(out.sum())
        dt = (time.time() - t0) / nrep
        tag = "int8" if dtype == jnp.int8 else "bf16"
        print(f"{tag} {mode:20s}: {dt*1e3:7.2f} ms "
              f"({dt/ (Q//QT * N//CK) * 1e6:5.2f} us/step)", flush=True)
