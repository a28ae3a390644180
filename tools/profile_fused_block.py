"""Pass-level ablation of the canvas fused_block kernel (block_pallas.py).

Times, at the two bench-dominating shapes (512^2 x 48 enc1, 512^2 x 96 dec1):
  - whole fused_block
  - pass 1 alone (front: LN+qkv+dwconv+qk accumulation)
  - pass 2 alone (apply+GDFN)
  - pass 1 without the dwconv 9-shift loop (ablation)
  - pass 2 without the GDFN dwconv loops (ablation)
and prints the per-block HBM bandwidth implied by the canvas traffic.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from image_restoration_tpu.kernels import block_pallas as bp


def bench(name, fn, *args, chain=32):
    """Chained-differencing when the fn is shape-preserving (canvas cp ==
    cps at the bench shapes, so pass-1/pass-2 chain on their own output);
    repeated-dispatch fallback otherwise. Only the chained numbers are
    trustworthy through the axon tunnel (block_until_ready does not
    synchronize — tools/pipeline_probe.py r4 measured the same kernel at
    0.014 ms by dispatch vs 0.602 ms chained)."""
    x0 = args[0]
    probe = jax.eval_shape(fn, *args)
    if probe.shape == x0.shape and probe.dtype == x0.dtype and len(args) == 1:
        from chain_bench import marginal

        best = marginal(fn, x0, n1=4, n2=12)
        print(f"  {name:34s} {best*1e3:8.3f} ms   [chained]")
        return best
    run = jax.jit(fn)
    jax.block_until_ready(run(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(chain):
            out = run(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / chain)
    print(f"  {name:34s} {best*1e3:8.3f} ms   [dispatch]")
    return best


def make_params(key, c, hidden, heads=1):
    ks = jax.random.split(key, 8)
    n = lambda i, *s: jax.random.normal(ks[i], s, jnp.float32) * 0.05
    return (jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32),
            n(0, c, 3 * c), None, n(1, 3, 3, 1, 3 * c), None,
            jnp.ones((heads, 1, 1), jnp.float32), n(2, c, c), None,
            jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32),
            n(3, c, 2 * hidden), None, n(4, 3, 3, 1, 2 * hidden), None,
            n(5, hidden, c), None)


def profile_shape(c, h, w, heads):
    hidden = int(c * 2.66)
    print(f"shape 1x{h}x{w}x{c} heads={heads} hidden={hidden}")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, h, w, c), jnp.bfloat16) * 0.1
    xc = bp.canvas_pad(x)
    params = make_params(key, c, hidden, heads)
    cfg = (c, w, heads, "WithBias", 1e-5)

    t_all = bench("fused_block (both passes)", lambda z: bp.fused_block(
        z, params, cfg, None), xc)

    # --- pass-1 only: replicate _forward up to pass 1, return vmap ---
    b, hh, wp, cp = xc.shape
    cps = bp._round_up(c, 128)
    cs = c if bp._round_up(3 * c, 128) < 3 * cps else cps
    op = bp._round_up(3 * cs, 128)
    qk_lo = (cs // 128) * 128
    qk_hi = bp._round_up(2 * cs + c, 128)
    span = qk_hi - qk_lo
    hp = bp._round_up(hidden, 128)
    pk = bp._pack_params(params, c, cp, cps, hp, hidden, cs, op)

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def front_ablate(xprev_ref, xcur_ref, xnext_ref, lnw_ref, lnb_ref, w_ref,
                     b_ref, dw_ref, db_ref, v_ref, qkprod_ref, ss_ref,
                     *, th, width, c_real, cps, cs, qk_lo, qk_hi, ln_bias,
                     eps, h_total, do_ln=True, do_dw=True, do_qk=True,
                     do_mask=True, bf16_direct=False, proj_bf16=False):
        wp_ = xcur_ref.shape[2]
        cp_ = xcur_ref.shape[-1]
        op_ = w_ref.shape[-1]
        hi = pl.program_id(1)
        th2 = th + 2
        xs = jnp.concatenate([xprev_ref[0], xcur_ref[0], xnext_ref[0]], axis=0)
        if bf16_direct:
            y2 = xs.reshape(th2 * wp_, cp_)
        else:
            xf = xs.astype(jnp.float32)
            if do_ln:
                s1 = jnp.sum(xf, axis=-1, keepdims=True)
                s2 = jnp.sum(xf * xf, axis=-1, keepdims=True)
                mu = s1 / c_real
                var = s2 / c_real - mu * mu
                inv = jax.lax.rsqrt(var + eps)
                y = (xf - mu) * inv * lnw_ref[:] + lnb_ref[:]
            else:
                y = xf
            y2 = y.reshape(th2 * wp_, cp_).astype(jnp.bfloat16)
        proj = jnp.dot(y2, w_ref[:], preferred_element_type=jnp.float32)
        proj = (proj + b_ref[:]).reshape(th2, wp_, op_)
        if do_mask:
            rows = jax.lax.broadcasted_iota(jnp.int32, (th2, wp_), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (th2, wp_), 1)
            grow = rows + hi * th - 1
            valid = ((grow >= 0) & (grow < h_total)
                     & (cols >= 1) & (cols <= width))
            proj = proj * valid.astype(jnp.float32)[:, :, None]
        if proj_bf16:
            proj = proj.astype(jnp.bfloat16)
        acc = jnp.zeros((th, width, op_), jnp.float32)
        if do_dw:
            for kh in (0, 1, 2):
                for kw in (0, 1, 2):
                    acc = acc + proj[kh:kh + th, kw:kw + width, :] * dw_ref[kh * 3 + kw]
        else:
            # kw=0 keeps the canonical sublane offset (a kw=1 slice imposes
            # an offset-1 layout Mosaic can't concat-pad); timing-only.
            acc = acc + proj[1:1 + th, 0:width, :] * dw_ref[4]
        acc = acc + db_ref[:]

        v_ref[0] = jnp.zeros((th, wp_, cps), v_ref.dtype)
        v_ref[0, :, 1:1 + width, :] = acc[:, :, :cps].astype(v_ref.dtype)

        span = qk_hi - qk_lo
        if do_qk:
            sf = acc[:, :, qk_lo:qk_hi].reshape(th * width, span)
            prod = jax.lax.dot_general(sf.astype(jnp.bfloat16),
                                       sf.astype(jnp.bfloat16),
                                       (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            ss = jnp.sum(sf * sf, axis=0, keepdims=True)
        else:
            prod = jnp.zeros((span, span), jnp.float32)
            ss = jnp.zeros((1, span), jnp.float32)

        @pl.when(hi == 0)
        def _init():
            qkprod_ref[0] = prod
            ss_ref[0] = ss

        @pl.when(hi != 0)
        def _accum():
            qkprod_ref[0] += prod
            ss_ref[0] += ss

    def run_pass1(z, kernel_fn=None, th_override=None, **abl):
        def vmem1(t):
            return ((t + 2) * wp * cp * 2 + (t + 2) * wp * cp * 4
                    + (t + 2) * wp * op * 4 + t * w * op * 4
                    + t * wp * cps * 2 + span * span * 4)
        th1 = th_override or bp._pick_th(vmem1, hh)
        n1 = hh // th1
        cur = lambda tt, lanes: pl.BlockSpec(
            (1, tt, wp, lanes), lambda bi, hi: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM)
        rowb = lambda off, tt, lanes: pl.BlockSpec(
            (1, 1, wp, lanes),
            lambda bi, hi, off=off, tt=tt: (bi, jnp.clip(hi * tt + off, 0, hh - 1), 0, 0),
            memory_space=pltpu.VMEM)
        vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
        base = kernel_fn or bp._front_kernel
        kern1 = functools.partial(
            base, th=th1, width=w, c_real=c, cps=cps, cs=cs,
            qk_lo=qk_lo, qk_hi=qk_hi, ln_bias=True, eps=1e-5, h_total=hh,
            **abl)
        vmap, prod, sss = pl.pallas_call(
            kern1, grid=(b, n1),
            in_specs=[rowb(-1, th1, cp), cur(th1, cp), rowb(th1, th1, cp)]
                     + [vspec] * 6,
            out_specs=[
                pl.BlockSpec((1, th1, wp, cps), lambda bi, hi: (bi, hi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, span, span), lambda bi, hi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, span), lambda bi, hi: (bi, 0, 0),
                             memory_space=pltpu.VMEM)],
            out_shape=[
                jax.ShapeDtypeStruct((b, hh, wp, cps), z.dtype),
                jax.ShapeDtypeStruct((b, span, span), jnp.float32),
                jax.ShapeDtypeStruct((b, 1, span), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(z, z, z, pk["ln1w"], pk["ln1b"], pk["wq"], pk["bq"], pk["dw"],
          pk["db"])
        return vmap

    t1 = bench("pass 1 (front+qk acc)", run_pass1, xc)
    for nm, abl in (("no-dwconv", dict(do_dw=False)),
                    ("no-qk", dict(do_qk=False)),
                    ("no-ln", dict(do_ln=False)),
                    ("matmul+v only",
                     dict(do_dw=False, do_qk=False, do_ln=False)),
                    ("no-mask", dict(do_mask=False)),
                    ("proj-bf16", dict(proj_bf16=True)),
                    ("mm+v bf16-direct",
                     dict(do_dw=False, do_qk=False, do_ln=False,
                          do_mask=False, bf16_direct=True)),
                    ("full proj-bf16+no-mask",
                     dict(proj_bf16=True, do_mask=False))):
        try:
            bench(f"pass 1 {nm}", lambda z, a=abl: run_pass1(
                z, kernel_fn=front_ablate, **a), xc)
        except Exception as e:
            print(f"  pass 1 {nm}: FAIL {type(e).__name__}")
    for th_o in (8, 16, 32, 64):
        if hh % th_o == 0:
            try:
                bench(f"pass 1 th={th_o}", lambda z, t=th_o: run_pass1(
                    z, th_override=t), xc)
            except Exception as e:
                print(f"  pass 1 th={th_o}: FAIL {type(e).__name__}")

    # --- micro: pure tile copy (DMA floor) and pure matmul ---
    def micro(kernel, th_m=16, out_lanes=None):
        out_lanes = out_lanes or cps
        n_m = hh // th_m
        return pl.pallas_call(
            kernel, grid=(b, n_m),
            in_specs=[pl.BlockSpec((1, th_m, wp, cp),
                                   lambda bi, hi: (bi, hi, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, th_m, wp, out_lanes),
                                   lambda bi, hi: (bi, hi, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, hh, wp, out_lanes), xc.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

    def k_copy(x_ref, w_ref, o_ref):
        o_ref[0] = x_ref[0]

    def k_mm(x_ref, w_ref, o_ref):
        t, wp_, cp_ = x_ref.shape[1:]
        y2 = x_ref[0].reshape(t * wp_, cp_)
        p = jnp.dot(y2, w_ref[:, :cp_], preferred_element_type=jnp.float32)
        o_ref[0] = p.reshape(t, wp_, cp_).astype(o_ref.dtype)

    def k_mm_op(x_ref, w_ref, o_ref):
        t, wp_, cp_ = x_ref.shape[1:]
        y2 = x_ref[0].reshape(t * wp_, cp_)
        p = jnp.dot(y2, w_ref[:], preferred_element_type=jnp.float32)
        # reduce op lanes back to cps before the store (sliced, aligned)
        o_ref[0] = p.reshape(t, wp_, op)[:, :, :cps].astype(o_ref.dtype)

    wfull = jnp.zeros((cp, op), jnp.bfloat16)
    try:
        bench("micro copy-only", lambda z: micro(k_copy)(z, wfull), xc)
        bench("micro mm 128->128 + store", lambda z: micro(k_mm)(z, wfull), xc)
        bench(f"micro mm 128->{op} + store", lambda z: micro(k_mm_op)(
            z, wfull), xc)
    except Exception as e:
        print(f"  micro: FAIL {type(e).__name__}: {e}")

    vmap = jax.jit(run_pass1)(xc)
    atw = jnp.zeros((b, cps, cp), xc.dtype)

    def run_pass2(vm):
        def vmem2(t):
            return ((t + 2) * wp * (cps + cp) * 2
                    + (t + 2) * wp * cp * 4
                    + (t + 2) * wp * 2 * hp * 4
                    + t * w * 2 * hp * 4
                    + t * wp * cp * 4 + cps * cp * 4)
        th2 = bp._pick_th(vmem2, hh)
        n2 = hh // th2
        cur = lambda tt, lanes: pl.BlockSpec(
            (1, tt, wp, lanes), lambda bi, hi: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM)
        rowb = lambda off, tt, lanes: pl.BlockSpec(
            (1, 1, wp, lanes),
            lambda bi, hi, off=off, tt=tt: (bi, jnp.clip(hi * tt + off, 0, hh - 1), 0, 0),
            memory_space=pltpu.VMEM)
        vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
        kern2 = functools.partial(
            bp._apply_gdfn_kernel, th=th2, width=w, c_real=c, hp=hp,
            ln_bias=True, eps=1e-5, h_total=hh)
        out = pl.pallas_call(
            kern2, grid=(b, n2),
            in_specs=[rowb(-1, th2, cps), cur(th2, cps), rowb(th2, th2, cps),
                      rowb(-1, th2, cp), cur(th2, cp), rowb(th2, th2, cp),
                      pl.BlockSpec((1, cps, cp), lambda bi, hi: (bi, 0, 0),
                                   memory_space=pltpu.VMEM)] + [vspec] * 9,
            out_specs=pl.BlockSpec((1, th2, wp, cp),
                                   lambda bi, hi: (bi, hi, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, hh, wp, cp), xc.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(vm, vm, vm, xc, xc, xc, atw, pk["bp"], pk["ln2w"],
          pk["ln2b"], pk["wcg"], pk["bcg"], pk["dwcg"], pk["dbcg"],
          pk["wo"], pk["bo"])
        return out

    t2 = bench("pass 2 (apply+GDFN)", run_pass2, vmap)

    canvas_mb = (hh * wp * cp * 2) / 1e6
    vmap_mb = (hh * wp * cps * 2) / 1e6
    traffic1 = canvas_mb + vmap_mb          # read x, write v (halo rows ~free)
    traffic2 = vmap_mb + canvas_mb + canvas_mb
    print(f"  pass1 traffic ~{traffic1:.0f} MB -> {traffic1/1e3/t1:7.0f} GB/s")
    print(f"  pass2 traffic ~{traffic2:.0f} MB -> {traffic2/1e3/t2:7.0f} GB/s")
    print()


if __name__ == "__main__":
    profile_shape(48, 512, 512, 1)
    profile_shape(96, 512, 512, 2)
