"""KITTI-scale RPN tail (deconvs+heads) formulation A/B.

probe_kitti_rpn.py measured the tail at 1.58 ms (23 TF/s on 37 GFLOP) —
HBM-bound, not MXU-bound: the [496, 432, 384] f32 concat is ~330 MB
materialized then re-read by three 1x1 head convs. Variants:

  A. baseline: 3 deconvs -> concat -> 3 head convs (models/rpn.py RPNTail)
  B. no-concat: distribute each 1x1 head over the three up-branches and
     sum (mathematically identical: conv(concat(u1,u2,u3), W) =
     sum_i conv(u_i, W_i) with W split along the input-channel axis)
  C. pixel-shuffle deconvs: ConvTranspose(kernel==stride) rewritten as a
     1x1 conv to [H, W, s*s*C] + depth-to-space reshape (one big MXU
     matmul instead of a strided transposed conv), then variant B heads.

Usage: PYTHONPATH=/root/.axon_site:. JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       python scripts/probe_rpn_tail_variants.py
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from pillars_tpu.config import Config
from pillars_tpu.models.rpn import RPN, RPNTail


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
    print(f"{name:44s} {ms:8.3f} ms/iter   (compile+1run {compile_s:.1f}s)",
          flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()
    rng = np.random.RandomState(0)
    NB = 4

    cfg = Config.from_yaml("configs/kitti_3class.yaml")
    mcfg = cfg.model
    _, ny, nx = mcfg.feature_map_size
    C = mcfg.pfn.num_filters

    rpn = RPN(mcfg)
    canvas0 = jnp.asarray(rng.randn(1, ny, nx, C).astype(np.float32) * 0.3)
    variables = rpn.init(jax.random.PRNGKey(0), canvas0, False)
    tail = RPNTail(mcfg)

    # block outputs as inputs to the tail
    from pillars_tpu.models.rpn import _Block
    bvars = [
        {"params": variables["params"][f"block{i + 1}"],
         "batch_stats": variables["batch_stats"][f"block{i + 1}"]}
        for i in range(3)
    ]
    blocks = [
        _Block(mcfg.rpn.num_filters[i], mcfg.rpn.layer_nums[i],
               mcfg.rpn.layer_strides[i], mcfg.rpn.bn_momentum,
               mcfg.rpn.bn_eps, separable=mcfg.rpn.use_separable_conv)
        for i in range(3)
    ]
    b1 = jax.jit(lambda cv: blocks[0].apply(bvars[0], cv, False))(canvas0)
    b2 = jax.jit(lambda x: blocks[1].apply(bvars[1], x, False))(b1)
    b3 = jax.jit(lambda x: blocks[2].apply(bvars[2], x, False))(b2)
    tb = (jnp.broadcast_to(b1, (NB,) + b1.shape),
          jnp.broadcast_to(b2, (NB,) + b2.shape),
          jnp.broadcast_to(b3, (NB,) + b3.shape))

    p = variables["params"]
    bs = variables["batch_stats"]

    def bn_affine(dp, ds):
        """Fold inference-mode BN into scale/shift."""
        inv = 1.0 / jnp.sqrt(ds["var"] + mcfg.rpn.bn_eps)
        return dp["scale"] * inv, dp["bias"] - ds["mean"] * dp["scale"] * inv

    def deconv_bn_relu(x, i):
        dp = p[f"deconv{i}"]
        k = dp["deconv"]["kernel"]  # [kh, kw, Cin, Cout] (flax HWIO)
        s = mcfg.rpn.upsample_strides[i - 1]
        y = jax.lax.conv_transpose(
            x, k, (s, s), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        sc, sh = bn_affine(dp["bn"], bs[f"deconv{i}"]["bn"])
        return jax.nn.relu(y * sc + sh)

    def deconv_pixelshuffle(x, i):
        dp = p[f"deconv{i}"]
        k = dp["deconv"]["kernel"]  # [s, s, Cin, Cout] (flax HWIO)
        s = mcfg.rpn.upsample_strides[i - 1]
        cout = k.shape[3]
        if s == 1:
            y = jnp.einsum("bhwi,io->bhwo", x, k[0, 0])
        else:
            # out[b, h*s+dy, w*s+dx, o] = sum_i x[b,h,w,i] k[dy,dx,i,o]
            # -> [B,H,W,Cin] @ [Cin, s*s*Cout] then depth-to-space
            w = jnp.transpose(k, (2, 0, 1, 3)).reshape(x.shape[-1], -1)
            y = (x @ w).reshape(x.shape[0], x.shape[1], x.shape[2], s, s,
                                cout)
            y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(
                x.shape[0], x.shape[1] * s, x.shape[2] * s, cout)
        sc, sh = bn_affine(dp["bn"], bs[f"deconv{i}"]["bn"])
        return jax.nn.relu(y * sc + sh)

    def heads_concat(u):
        x = jnp.concatenate(u, axis=-1)
        out = []
        for name in ("conv_box", "conv_cls", "conv_dir_cls"):
            hp = p[name]
            out.append(jnp.einsum("bhwi,oi->bhwo", x,
                                  hp["kernel"][0, 0].T) + hp["bias"])
        return out

    def heads_split(u):
        out = []
        for name in ("conv_box", "conv_cls", "conv_dir_cls"):
            hp = p[name]
            k = hp["kernel"][0, 0]  # [384, out]
            acc = hp["bias"]
            off = 0
            for ui in u:
                c = ui.shape[-1]
                acc = acc + jnp.einsum("bhwi,io->bhwo", ui,
                                       k[off:off + c])
                off += c
            out.append(acc)
        return out

    def pA(carry, bsx):
        preds = tail.apply(variables, *bsx, False)
        return carry + sum(jnp.sum(v[0, :, :, 0].astype(jnp.float32))
                           for v in preds.values()), None

    def pB(carry, bsx):
        u = [deconv_bn_relu(x, i + 1) for i, x in enumerate(bsx)]
        outs = heads_split(u)
        return carry + sum(jnp.sum(v[0, :, :, 0].astype(jnp.float32))
                           for v in outs), None

    def pC(carry, bsx):
        u = [deconv_pixelshuffle(x, i + 1) for i, x in enumerate(bsx)]
        outs = heads_split(u)
        return carry + sum(jnp.sum(v[0, :, :, 0].astype(jnp.float32))
                           for v in outs), None

    def pD(carry, bsx):
        u = [deconv_pixelshuffle(x, i + 1) for i, x in enumerate(bsx)]
        outs = heads_concat(u)
        return carry + sum(jnp.sum(v[0, :, :, 0].astype(jnp.float32))
                           for v in outs), None

    @jax.jit
    def basef(x):
        return jnp.sum(x[0][0, 0, 0, 0])

    _ = jax.device_get(basef(tb))
    syncs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.device_get(basef(tb))
        syncs.append(time.perf_counter() - t0)
    sync = min(syncs)
    print(f"sync baseline {sync*1e3:.1f} ms", flush=True)
    it = args.iters

    timed("A: flax tail (deconv+concat+heads)", pA, tb, it, sync)
    timed("B: manual deconv + split heads", pB, tb, it, sync)
    timed("C: pixel-shuffle deconv + split heads", pC, tb, it, sync)
    timed("D: pixel-shuffle deconv + concat heads", pD, tb, it, sync)

    # numerical equivalence of the variants (f32 accumulation differences
    # only; the math is identical)
    want = tail.apply(variables, b1, b2, b3, False)
    u = [deconv_bn_relu(x, i + 1) for i, x in enumerate((b1, b2, b3))]
    gotB = heads_split(u)
    uC = [deconv_pixelshuffle(x, i + 1) for i, x in enumerate((b1, b2, b3))]
    gotC = heads_split(uC)
    keys = ["conv_box", "conv_cls", "conv_dir_cls"]
    wmap = {"conv_box": want["box_preds"], "conv_cls": want["cls_preds"],
            "conv_dir_cls": want["dir_cls_preds"]}
    for i, k in enumerate(keys):
        for tag, got in (("B", gotB[i]), ("C", gotC[i])):
            err = float(jnp.max(jnp.abs(wmap[k] - got)))
            scale = float(jnp.max(jnp.abs(wmap[k])))
            print(f"{tag} {k}: max|diff| {err:.3e} (scale {scale:.3e})",
                  flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
