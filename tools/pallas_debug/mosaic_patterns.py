"""Empirical probe: which jnp patterns lower in a Mosaic TC kernel on
the REAL TPU (compiled, not interpret).  Run when redesigning the fused
chunk kernel's row assembly — dynamic_update_slice on VALUES is not
implemented in the TC lowering (tests_tpu round-2 failure), so every
row build must go through concat/stack/pad patterns that ARE.

Usage: python tools/pallas_debug/mosaic_patterns.py
Prints PASS/FAIL per pattern with the first error line.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = jnp.float32


def run(name, kernel, out_shape, *args):
    try:
        got = pl.pallas_call(kernel, out_shape=out_shape)(*args)
        jax.block_until_ready(got)
        print(f"PASS  {name}")
        return got
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()[0][:160]
        print(f"FAIL  {name}: {type(e).__name__}: {msg}")
        return None


def main():
    a = jnp.arange(8 * 256, dtype=f32).reshape(8, 256)
    b = a + 1.0
    c = a + 2.0
    s = jax.ShapeDtypeStruct

    # P1: lane-dim concat of 256-wide blocks
    def k1(a_ref, b_ref, c_ref, o_ref):
        o_ref[:] = jnp.concatenate([a_ref[:], b_ref[:], c_ref[:]], axis=1)
    run("P1 lane concat 3x[8,256] -> [8,768]", k1, s((8, 768), f32), a, b, c)

    # P1b: lane concat with unaligned 192-wide pieces
    a192 = a[:, :192]
    def k1b(a_ref, o_ref):
        x = a_ref[:]
        o_ref[:] = jnp.concatenate([x, x * 2.0], axis=1)
    run("P1b lane concat 2x[8,192] -> [8,384]", k1b, s((8, 384), f32), a192)

    # P2: sublane (axis 0) concat
    def k2(a_ref, o_ref):
        x = a_ref[:]
        o_ref[:] = jnp.concatenate([x[:1] * 0.0, x[:7]], axis=0)
    run("P2 sublane concat [1,256]+[7,256]", k2, s((8, 256), f32), a)

    # P3: 3D stack along middle dim from [M,1,L] pieces
    m3 = jnp.arange(35 * 192, dtype=f32).reshape(35, 192)
    def k3(a_ref, o_ref):
        x = a_ref[:]
        o_ref[:] = jnp.concatenate(
            [x[:, None, :], (x * 2.0)[:, None, :], (x * 3.0)[:, None, :]],
            axis=1)
    run("P3 mid-dim concat 3x[35,1,192] -> [35,3,192]", k3,
        s((35, 3, 192), f32), m3)

    # P4: sublane reshape [216,192] -> [36,6,192] -> ops -> back
    d4 = jnp.arange(216 * 192, dtype=f32).reshape(216, 192)
    def k4(a_ref, o_ref):
        x = a_ref[:].reshape(36, 6, 192)
        o_ref[:] = (x * 2.0).reshape(216, 192)
    run("P4 sublane reshape roundtrip [216,192]<->[36,6,192]", k4,
        s((216, 192), f32), d4)

    # P5: jnp.pad lanes 192 -> 256
    def k5(a_ref, o_ref):
        o_ref[:] = jnp.pad(a_ref[:], ((0, 0), (0, 64)))
    run("P5 lane pad [8,192] -> [8,256]", k5, s((8, 256), f32), a192)

    # P6: ref write with dynamic sublane + static aligned lane slice
    def k6(a_ref, o_ref):
        o_ref[:] = jnp.zeros_like(o_ref)
        def body(k, _):
            o_ref[pl.ds(k, 1), 256:512] = a_ref[pl.ds(k, 1), :256] * 2.0
            return 0
        jax.lax.fori_loop(0, 8, body, 0)
    run("P6 ref write [ds(k,1), 256:512]", k6, s((8, 768), f32), a)

    # P6b: ref write dynamic sublane + static UNALIGNED lane slice len 192
    def k6b(a_ref, o_ref):
        o_ref[:] = jnp.zeros_like(o_ref)
        def body(k, _):
            o_ref[pl.ds(k, 1), 0:192] = a_ref[pl.ds(k, 1), :192] * 2.0
            return 0
        jax.lax.fori_loop(0, 8, body, 0)
    run("P6b ref write [ds(k,1), 0:192] into [8,768]", k6b,
        s((8, 768), f32), a)

    # P7: 3D ref write [ds(k,1), f, :] with static f
    def k7(a_ref, o_ref):
        o_ref[:] = jnp.zeros_like(o_ref)
        def body(k, _):
            for f in range(3):
                o_ref[pl.ds(k, 1), f, :] = a_ref[pl.ds(k, 1), :192] * (
                    1.0 + f)
            return 0
        jax.lax.fori_loop(0, 8, body, 0)
    run("P7 3D ref write [ds(k,1), f, :]", k7, s((8, 3, 192), f32), a)

    # P8: sum over leading dim of 3D product (dapply pattern, [B3,phi,B3])
    g8 = jnp.arange(192 * 3 * 192, dtype=f32).reshape(192, 3, 192) * 1e-4
    col = jnp.arange(192, dtype=f32).reshape(192, 1, 1)
    def k8(g_ref, c_ref, o_ref):
        o_ref[:] = jnp.sum(g_ref[:] * c_ref[:], axis=0)
    run("P8 sum(3D*[192,1,1], axis=0) -> [3,192]", k8, s((3, 192), f32),
        g8, col)

    # P9: broadcast [8,1,192] * [1,3,1] style into [8,3,192]
    def k9(a_ref, o_ref):
        x = a_ref[:][:, None, :]
        w = jnp.arange(3, dtype=f32).reshape(1, 3, 1)
        o_ref[:] = x * w
    run("P9 broadcast [8,1,192]*[1,3,1]", k9, s((8, 3, 192), f32), m3[:8])

    # P10: value roll along lanes by GROUP (alternative to concat moves)
    def k10(a_ref, o_ref):
        o_ref[:] = jnp.roll(a_ref[:], 256, axis=1)
    run("P10 lane roll by 256 on [8,768]", k10, s((8, 768), f32),
        jnp.tile(a, (1, 3)))

    # P11: dynamic_update_slice on value (the known failure, for record)
    def k11(a_ref, o_ref):
        x = jnp.zeros((8, 768), f32)
        x = jax.lax.dynamic_update_slice(x, a_ref[:], (0, 256))
        o_ref[:] = x
    run("P11 dus on value (expected FAIL)", k11, s((8, 768), f32), a)

    # P12: x.at[1:8, 1, :].add(v) on 3D value (static slices)
    def k12(a_ref, o_ref):
        x = jnp.zeros((8, 3, 192), f32)
        x = x.at[1:8, 1, :].add(a_ref[:7, :192])
        o_ref[:] = x
    run("P12 .at[1:8,1,:].add on 3D value", k12, s((8, 3, 192), f32), a)


if __name__ == "__main__":
    main()
