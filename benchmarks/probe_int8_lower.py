"""Local Mosaic lowering probe: can Pallas TPU lower int8 MXU contractions?

Run from the repo root with the axon TPU backend (lowering is LOCAL; only
.compile() goes to the remote service — CLAUDE.md):

    python - < benchmarks/probe_int8_lower.py

Probes the contraction shapes an int8 sampling-kernel mode would use:
  A) s8 (win_w, win_h*4) @ s8 (win_w, chunk) -> i32   (stage A, contracting
     the sublane dim of both operands — the kernel's layout)
  B) u8 window x s8 weights -> i32 (unsigned image operand)
  C) s8 -> i32 widening column-sum (the +128 offset term)
  D) i32 -> f32 epilogue scale
  E) f32 -> s8 weight build (round + convert, relu-triangle bilinear)
"""
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

WIN_W, WINH4, CHUNK = 256, 128 * 4, 512
DN = (((0,), (0,)), ((), ()))


def probe(name, fn, shapes_dtypes):
    args = [jnp.zeros(s, d) for s, d in shapes_dtypes]
    try:
        out_shape = jax.eval_shape(fn, *args)

        def kern(*refs):
            refs[-1][...] = fn(*[r[...] for r in refs[:-1]])

        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(out_shape.shape, out_shape.dtype),
        )
        jax.jit(f).lower(*args)
        print(f"  {name}: Mosaic lowering OK")
        return True
    except Exception as e:  # noqa: BLE001
        print(f"  {name}: FAILED -> {type(e).__name__}: {str(e)[:300]}")
        return False


def main():
    print(f"backend: {jax.default_backend()}")
    print("probe A: s8 @ s8 -> i32 (stage-A shape)")
    probe(
        "A",
        lambda w, m: jax.lax.dot_general(
            w, m, dimension_numbers=DN, preferred_element_type=jnp.int32
        ),
        [((WIN_W, WINH4), jnp.int8), ((WIN_W, CHUNK), jnp.int8)],
    )
    print("probe B: u8 @ s8 -> i32")
    probe(
        "B",
        lambda w, m: jax.lax.dot_general(
            w, m, dimension_numbers=DN, preferred_element_type=jnp.int32
        ),
        [((WIN_W, WINH4), jnp.uint8), ((WIN_W, CHUNK), jnp.int8)],
    )
    print("probe C: s8 -> i32 widening column-sum")
    probe(
        "C",
        lambda m: jnp.sum(m.astype(jnp.int32), axis=0, keepdims=True)
        + jnp.zeros((1, CHUNK), jnp.int32),
        [((WIN_W, CHUNK), jnp.int8)],
    )
    print("probe D: i32 -> f32 epilogue")
    probe(
        "D",
        lambda a: a.astype(jnp.float32) * (1.0 / (127.0 * 255.0)),
        [((WINH4, CHUNK), jnp.int32)],
    )
    print("probe E: f32 relu-triangle weight build -> s8")
    probe(
        "E",
        lambda p: jnp.round(
            127.0
            * jnp.maximum(
                0.0,
                1.0
                - jnp.abs(
                    jax.lax.broadcasted_iota(jnp.float32, (WIN_W, CHUNK), 0) - p
                ),
            )
        ).astype(jnp.int8),
        [((1, CHUNK), jnp.float32)],
    )


if __name__ == "__main__":
    main()
