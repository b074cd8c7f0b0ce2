"""Local Mosaic probe: int8/uint8 VMEM dynamic slices + DMA alignment.

The sampling kernel's subw tiers slice the window scratch at mult-8
dynamic SUBLANE offsets and DMA windows at mult-16 sublane origins; int8's
native VMEM tile is (32, 128), so these may need coarser alignment. Run:

    python - < benchmarks/probe_int8_slices.py
"""
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DN = (((0,), (0,)), ((), ()))


def probe(name, build):
    try:
        build()
        print(f"  {name}: Mosaic lowering OK")
        return True
    except Exception as e:  # noqa: BLE001
        print(f"  {name}: FAILED -> {type(e).__name__}: {str(e)[:200]}")
        return False


def dyn_sublane_slice(mult):
    """win2[pl.ds(off*mult, 128), :] on a u8 scratch, off from SMEM."""
    def kern(off_ref, img_ref, o_ref, win2, sem):
        cp = pltpu.make_async_copy(img_ref.at[pl.ds(0, 512), pl.ds(0, 512)],
                                   win2, sem)
        cp.start()
        cp.wait()
        off = pl.multiple_of(off_ref[0, 0] * mult, mult)
        w = win2[pl.ds(off, 128), :]
        ox = jnp.full((128, 512), 3, jnp.int8)
        o_ref[...] = jax.lax.dot_general(
            w, ox, DN, preferred_element_type=jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((512 * 4 // 4, 512), lambda i, s: (0, 0)),
        scratch_shapes=[pltpu.VMEM((512, 512), jnp.uint8),
                        pltpu.SemaphoreType.DMA],
    )
    f = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((512, 512), jnp.int32),
        grid_spec=grid_spec)
    jax.jit(f).lower(jnp.zeros((1, 128), jnp.int32),
                     jnp.zeros((1024, 2048), jnp.uint8))


def dyn_dma(sub_mult, lane_mult):
    """Window DMA at dynamic (mult-sub_mult sublane, mult-lane_mult lane)
    origins from a u8 HBM image."""
    def kern(oy_ref, img_ref, o_ref, win2, sem):
        ox = pl.multiple_of(oy_ref[0, 0] * sub_mult, sub_mult)
        lane = pl.multiple_of(oy_ref[0, 1] * lane_mult, lane_mult)
        cp = pltpu.make_async_copy(
            img_ref.at[pl.ds(ox, 512), pl.ds(lane, 512)], win2, sem)
        cp.start()
        cp.wait()
        w = win2[pl.ds(0, 128), :]
        oxm = jnp.full((128, 512), 3, jnp.int8)
        o_ref[...] = jax.lax.dot_general(
            w, oxm, DN, preferred_element_type=jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((512, 512), lambda i, s: (0, 0)),
        scratch_shapes=[pltpu.VMEM((512, 512), jnp.uint8),
                        pltpu.SemaphoreType.DMA],
    )
    f = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((512, 512), jnp.int32),
        grid_spec=grid_spec)
    jax.jit(f).lower(jnp.zeros((1, 128), jnp.int32),
                     jnp.zeros((2048, 4096), jnp.uint8))


def main():
    print(f"backend: {jax.default_backend()}")
    for m in (8, 16, 32):
        probe(f"dyn sublane slice u8, offset mult {m}",
              lambda m=m: dyn_sublane_slice(m))
    for sm, lm in ((16, 128), (32, 128), (8, 128)):
        probe(f"dyn window DMA u8, sublane mult {sm} lane mult {lm}",
              lambda sm=sm, lm=lm: dyn_dma(sm, lm))


main()
