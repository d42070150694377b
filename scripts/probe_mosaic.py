"""Probe which Pallas/Mosaic op patterns the real-TPU compile pipeline
accepts (the interpreter and client-side lowering both accept strictly more
than the server's Mosaic->LLO passes).  Each probe compiles one tiny kernel
via the remote AOT compiler and prints PASS/FAIL + the first error line.

Run: python scripts/probe_mosaic.py            (needs the TPU relay)
"""

import functools
import traceback

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 2048
C = 512


def probe(name, kernel, n_out=1, out_shape=None, scratch=None):
    out_shape = out_shape or [jax.ShapeDtypeStruct((N,), jnp.int32)
                              for _ in range(n_out)]
    spec = pl.BlockSpec((N,), lambda: (np.int32(0),), memory_space=pltpu.VMEM)
    outs = [pl.BlockSpec(s.shape, lambda: tuple(np.int32(0) for _ in s.shape),
                         memory_space=pltpu.VMEM) for s in out_shape]
    try:
        f = pl.pallas_call(
            kernel,
            in_specs=[spec],
            out_specs=outs if len(outs) > 1 else outs[0],
            out_shape=out_shape if len(out_shape) > 1 else out_shape[0],
            scratch_shapes=scratch or [],
        )
        x = jnp.zeros((N,), jnp.int32)
        jax.jit(f).lower(x).compile()
        print(f"PASS {name}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()
        key = next((ln for ln in msg if "Mosaic" in ln or "error" in ln.lower()),
                   msg[0] if msg else "?")
        print(f"FAIL {name}: {key[:160]}", flush=True)
        return False


def main():
    print(f"device={jax.devices()[0]}", flush=True)

    # 1. 2D->1D reshape (layout no-op?)
    def k_reshape21(x_ref, o_ref):
        v = x_ref[:].reshape(N // 128, 128)
        o_ref[:] = (v + 1).reshape(N)
    probe("reshape_2d_to_1d", k_reshape21)

    # 2. roll 2D axis=1, static shift
    def k_roll2d_static(x_ref, o_ref):
        v = x_ref[:].reshape(1, N)
        o_ref[:] = pltpu.roll(v, np.int32(1), 1).reshape(N)
    probe("roll_2d_axis1_static", k_roll2d_static)

    # 3. roll 2D axis=1, dynamic shift
    def k_roll2d_dyn(x_ref, o_ref):
        v = x_ref[:].reshape(1, N)
        s = jnp.sum(x_ref[pl.ds(0, 128)].reshape(1, 128), axis=1,
                    dtype=jnp.int32)[0]
        o_ref[:] = pltpu.roll(v, s, 1).reshape(N)
    probe("roll_2d_axis1_dynamic", k_roll2d_dyn)

    # 4. roll 2D axis=0 dynamic (sublane rotate)
    def k_roll2d_d0(x_ref, o_ref):
        v = x_ref[:].reshape(N // 128, 128)
        s = jnp.sum(x_ref[pl.ds(0, 128)].reshape(1, 128), axis=1,
                    dtype=jnp.int32)[0]
        o_ref[:] = pltpu.roll(v, s, 0).reshape(N)
    probe("roll_2d_axis0_dynamic", k_roll2d_d0)

    # 5. concat axis=0 of (k,128) blocks
    def k_concat0(x_ref, o_ref):
        v = x_ref[:].reshape(N // 128, 128)
        z = jnp.zeros((N // 128, 128), jnp.int32)
        w = jnp.concatenate([v, z], axis=0)
        o_ref[:] = jax.lax.slice_in_dim(w, 0, N // 128, axis=0).reshape(N)
    probe("concat_axis0_2d", k_concat0)

    # 6. concat axis=1 of (1,C) rows
    def k_concat1(x_ref, o_ref):
        a = x_ref[pl.ds(0, C)].reshape(1, C)
        b = x_ref[pl.ds(C, C)].reshape(1, C)
        w = jnp.concatenate([a, b, a, b], axis=1)  # (1, 4C)
        o_ref[:] = w.reshape(N)
    probe("concat_axis1_2d", k_concat1)

    # 7. dot_general (4,C)x(C,C) contracting dim1/dim1 -> (4,C)
    def k_dotg(x_ref, o_ref):
        v = x_ref[pl.ds(0, C)].reshape(1, C).astype(jnp.float32)
        p = jnp.concatenate([v, v + 1, v + 2, v + 3], axis=0)  # (4,C)
        iota = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
        m = jnp.where(iota == jax.lax.broadcasted_iota(jnp.int32, (C, C), 1),
                      jnp.float32(1), jnp.float32(0))
        r = jax.lax.dot_general(p, m, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (4,C)
        row = jax.lax.slice_in_dim(r, 0, 1, axis=0)  # (1,C)
        o_ref[pl.ds(0, C)] = row.reshape(C).astype(jnp.int32)
        o_ref[pl.ds(C, N - C)] = jnp.zeros((N - C,), jnp.int32)
    probe("dot_general_4xC_CxC", k_dotg)

    # 8. jnp.stack axis=1 of 1D arrays -> (C, k) then dot
    def k_stack(x_ref, o_ref):
        v = x_ref[pl.ds(0, C)].astype(jnp.float32)
        p = jnp.stack([v, v + 1, v + 2, v + 3], axis=1)  # (C,4)
        iota = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
        m = jnp.where(iota == jax.lax.broadcasted_iota(jnp.int32, (C, C), 1),
                      jnp.float32(1), jnp.float32(0))
        r = jnp.dot(m, p, preferred_element_type=jnp.float32)  # (C,4)
        col = r[:, 0]  # 1D column extract
        o_ref[pl.ds(0, C)] = col.astype(jnp.int32)
        o_ref[pl.ds(C, N - C)] = jnp.zeros((N - C,), jnp.int32)
    probe("stack_axis1_and_col_extract", k_stack)

    # 9. 1D dynamic ALIGNED store (multiple_of hint)
    def k_dynstore(x_ref, o_ref):
        s = jnp.sum(x_ref[pl.ds(0, 128)].reshape(1, 128), axis=1,
                    dtype=jnp.int32)[0]
        off = pl.multiple_of((s % 2) * np.int32(1024), 1024)
        o_ref[pl.ds(0, N)] = jnp.zeros((N,), jnp.int32)
        o_ref[pl.ds(off, 1024)] = x_ref[pl.ds(0, 1024)]
    probe("dyn_aligned_1d_store", k_dynstore)

    # 10. 1D dynamic aligned LOAD at traced c*1024
    def k_dynload(x_ref, o_ref):
        s = jnp.sum(x_ref[pl.ds(0, 128)].reshape(1, 128), axis=1,
                    dtype=jnp.int32)[0]
        off = pl.multiple_of((s % 2) * np.int32(1024), 1024)
        o_ref[pl.ds(0, 1024)] = x_ref[pl.ds(off, 1024)]
        o_ref[pl.ds(1024, N - 1024)] = jnp.zeros((N - 1024,), jnp.int32)
    probe("dyn_aligned_1d_load", k_dynload)

    # 11. transpose (C,4)->(4,C)
    def k_transpose(x_ref, o_ref):
        v = x_ref[pl.ds(0, C)].astype(jnp.float32)
        p = jnp.stack([v, v, v, v], axis=1)  # (C,4)
        t = jnp.transpose(p)  # (4,C)
        o_ref[pl.ds(0, C)] = t[0].astype(jnp.int32)
        o_ref[pl.ds(C, N - C)] = jnp.zeros((N - C,), jnp.int32)
    probe("transpose_Cx4", k_transpose)

    # 12. 3D scratch with dynamic sublane-block store
    def k_scratch3d(x_ref, o_ref, st):
        s = jnp.sum(x_ref[pl.ds(0, 128)].reshape(1, 128), axis=1,
                    dtype=jnp.int32)[0]
        r = pl.multiple_of((s % 2) * np.int32(8), 8)
        st[0, pl.ds(r, 8), :] = x_ref[pl.ds(0, 1024)].reshape(8, 128)
        o_ref[:] = st[0, pl.ds(0, 16), :].reshape(N)
    probe("scratch3d_dyn_sublane_store", k_scratch3d,
          scratch=[pltpu.VMEM((2, 16, 128), jnp.int32)])

    # 13. 1D cumsum via jnp.cumsum (known missing? confirm)
    def k_cumsum(x_ref, o_ref):
        o_ref[:] = jnp.cumsum(x_ref[:], dtype=jnp.int32)
    probe("jnp_cumsum_1d", k_cumsum)

    # 14. roll 1D static shift (the original _prefix_sum building block)
    def k_roll1d(x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], np.int32(1), 0)
    probe("roll_1d_static", k_roll1d)

    # 15. iota + where one-hot (CxC) + f32 convert + matmul (C,C)x(C,1)
    def k_prefixmm(x_ref, o_ref):
        f = x_ref[pl.ds(0, C)].reshape(1, C).astype(jnp.float32)
        a = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
        b = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
        tri = jnp.where(b <= a, jnp.float32(1), jnp.float32(0))
        seg = jax.lax.dot_general(f, tri, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)  # (1,C)
        o_ref[pl.ds(0, C)] = seg.reshape(C).astype(jnp.int32)
        o_ref[pl.ds(C, N - C)] = jnp.zeros((N - C,), jnp.int32)
    probe("prefix_sum_via_tri_matmul", k_prefixmm)


if __name__ == "__main__":
    main()
