"""Single-conv backward attribution at KITTI RPN shapes: dgrad vs wgrad,
plus alternative wgrad formulations.

The fused KITTI train step spends ~91 ms in RPN fwd+bwd vs ~9 ms forward
(probe_rpn_bwd.py). Backward of a conv = dgrad (same shape as fwd, should
cost ~fwd) + wgrad (a reduction over batch*space — the suspected hog at
B=2 with large spatial dims). This probe times, per conv shape:

  fwd                  forward conv only
  grad both            jax.grad wrt (x, w)        [XLA autodiff]
  dgrad only           jax.grad wrt x
  wgrad only           jax.grad wrt w
  wgrad 9-matmul       direct dW via k*k shifted [BHW,Ci]^T @ [BHW,Co]
                       einsums (skinny matmuls, K=B*OH*OW)
  wgrad patches        conv_general_dilated_patches + one matmul

If a manual formulation beats XLA's wgrad, a custom_vjp conv in the RPN
blocks is the follow-up; otherwise the conv-backward thread closes at
"XLA's schedule is the best known" and the remaining lever is Pallas.

Usage: PYTHONPATH=/root/.axon_site:. JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       python scripts/probe_conv_bwd.py [--iters N] [--bf16]
"""

import argparse
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp


def timed(name, fn, operands, iters, sync):
    n = jax.tree_util.tree_leaves(operands)[0].shape[0]

    @jax.jit
    def run(ops, reps):
        def outer(i, acc):
            acc2, _ = jax.lax.scan(fn, acc, ops)
            return acc2
        return jax.lax.fori_loop(0, reps, outer, 0.0)

    t0 = time.perf_counter()
    _ = jax.device_get(run(operands, 1))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = jax.device_get(run(operands, iters))
    total = time.perf_counter() - t0
    ms = (total - sync) * 1e3 / (n * iters)
    print(f"{name:52s} {ms:8.3f} ms/iter   (compile+1run {compile_s:.1f}s)",
          flush=True)
    return ms


def conv(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def wgrad_9matmul(x, dy, kh=3, kw=3, stride=1):
    """dW[dy,dx,ci,co] = sum_{b,oh,ow} x[b, oh*s+dy-p, ow*s+dx-p, ci]
    * dy[b,oh,ow,co], as k*k skinny matmuls with K = B*OH*OW."""
    b, h, wid, ci = x.shape
    _, oh, ow, co = dy.shape
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    xp = jnp.pad(x, ((0, 0), (ph, kh - 1 - ph), (pw, kw - 1 - pw), (0, 0)))
    dyf = dy.reshape(b * oh * ow, co)
    taps = []
    for dyi in range(kh):
        for dxi in range(kw):
            tap = jax.lax.slice(
                xp, (0, dyi, dxi, 0),
                (b, dyi + (oh - 1) * stride + 1,
                 dxi + (ow - 1) * stride + 1, ci),
                (1, stride, stride, 1)).reshape(b * oh * ow, ci)
            taps.append(tap)
    # [k*k, BHW, ci] -> one batched matmul [k*k, ci, co]
    tap_stack = jnp.stack(taps)
    dw = jnp.einsum("kpi,po->kio", tap_stack, dyf,
                    preferred_element_type=jnp.float32)
    return dw.reshape(kh, kw, ci, co)


def wgrad_patches(x, dy, kh=3, kw=3, stride=1):
    b, h, wid, ci = x.shape
    _, oh, ow, co = dy.shape
    patches = jax.lax.conv_general_dilated_patches(
        x, (kh, kw), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # [B,OH,OW,ci*kh*kw]
    p = patches.reshape(b * oh * ow, ci * kh * kw)
    dw = jnp.einsum("pk,po->ko", p, dy.reshape(b * oh * ow, co),
                    preferred_element_type=jnp.float32)
    # conv_general_dilated_patches feature order is [ci, kh, kw]
    return dw.reshape(ci, kh, kw, co).transpose(1, 2, 0, 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.bf16 else jnp.float32
    rng = np.random.RandomState(0)

    sync_probe = jnp.zeros((2, 8, 128))

    @jax.jit
    def base(x):
        return jnp.sum(x[0])

    _ = jax.device_get(base(sync_probe))
    syncs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.device_get(base(sync_probe))
        syncs.append(time.perf_counter() - t0)
    sync = min(syncs)
    print(f"sync baseline {sync*1e3:.1f} ms dtype={dt.__name__}", flush=True)
    it = args.iters
    NB = 2

    # oracle check for the manual wgrads (tiny shape, f32, CPU-safe on TPU)
    xs = jnp.asarray(rng.randn(2, 8, 10, 4).astype(np.float32))
    ws = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32))
    dys = jnp.asarray(rng.randn(2, 8, 10, 6).astype(np.float32))
    ref = jax.grad(lambda w: jnp.sum(conv(xs, w) * dys))(ws)
    for nm, f in [("9matmul", wgrad_9matmul), ("patches", wgrad_patches)]:
        got = f(xs, dys)
        err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
        print(f"oracle {nm}: max rel err {err:.2e}", flush=True)
        assert err < 1e-3, nm

    # (name, B, H, W, Ci, Co, stride)
    shapes = [
        ("block1 conv 64->64 496x432 s1", 2, 496, 432, 64, 64, 1),
        ("block2 conv 128->128 248x216 s1", 2, 248, 216, 128, 128, 1),
        ("block3 conv 256->256 124x108 s1", 2, 124, 108, 256, 256, 1),
    ]
    for name, B, H, W, Ci, Co, s in shapes:
        x_bank = jnp.asarray(rng.randn(NB, B, H, W, Ci).astype(np.float32),
                             dtype=dt)
        w0 = jnp.asarray(rng.randn(3, 3, Ci, Co).astype(np.float32) * 0.05,
                         dtype=dt)
        dy_bank = jnp.asarray(
            rng.randn(NB, B, H // s, W // s, Co).astype(np.float32), dtype=dt)

        def fwd(carry, op):
            x = op
            y = conv(x, w0, s)
            return carry + jnp.sum(y).astype(jnp.float32) * 0, None

        timed(f"{name} fwd", fwd, x_bank, it, sync)

        def gboth(carry, op):
            x, dy = op

            def loss(x, w):
                return jnp.sum(conv(x, w, s) * dy)

            gx, gw = jax.grad(loss, argnums=(0, 1))(x, w0)
            return carry + (jnp.sum(gx) + jnp.sum(gw)).astype(
                jnp.float32) * 0, None

        timed(f"{name} grad both", gboth, (x_bank, dy_bank), it, sync)

        def gx_only(carry, op):
            x, dy = op
            gx = jax.grad(lambda x: jnp.sum(conv(x, w0, s) * dy))(x)
            return carry + jnp.sum(gx).astype(jnp.float32) * 0, None

        timed(f"{name} dgrad only", gx_only, (x_bank, dy_bank), it, sync)

        def gw_only(carry, op):
            x, dy = op
            gw = jax.grad(lambda w: jnp.sum(conv(x, w, s) * dy))(w0)
            return carry + jnp.sum(gw).astype(jnp.float32) * 0, None

        timed(f"{name} wgrad only", gw_only, (x_bank, dy_bank), it, sync)

        def gw_9mm(carry, op):
            x, dy = op
            gw = wgrad_9matmul(x, dy, stride=s)
            return carry + jnp.sum(gw).astype(jnp.float32) * 0, None

        timed(f"{name} wgrad 9-matmul", gw_9mm, (x_bank, dy_bank), it, sync)

        def gw_pat(carry, op):
            x, dy = op
            gw = wgrad_patches(x, dy, stride=s)
            return carry + jnp.sum(gw).astype(jnp.float32) * 0, None

        timed(f"{name} wgrad patches", gw_pat, (x_bank, dy_bank), it, sync)

    print("done", flush=True)


if __name__ == "__main__":
    main()
