"""Reference .h5 checkpoint import: build a Keras-save_weights-layout file
(the genuine reference blob is stripped from this mount) from known arrays,
import it, and check every parameter landed with the right transposition."""

import numpy as np
import pytest

import jax

h5py = pytest.importorskip("h5py")

from pillars_tpu.config import Config
from pillars_tpu.models.detector import PillarsDetector
from pillars_tpu.train.checkpoint import import_reference_h5


def small_cfg():
    cfg = Config.default()
    cfg = cfg.override("model.voxel.max_voxels", 256)
    cfg = cfg.override("model.voxel.max_points", 1024)
    return cfg


def build_fake_keras_h5(path, variables, rng):
    """Write a Keras-layout h5 whose arrays are RANDOM but correctly shaped
    (with Keras's kernel layouts), and return the expected flax pytree."""
    import copy

    expected = copy.deepcopy(jax.device_get(variables))
    params, stats = expected["params"], expected["batch_stats"]

    def rnd(shape):
        return rng.randn(*shape).astype(np.float32)

    with h5py.File(path, "w") as f:
        # loss layer's code_weights (non-trainable, ignored by the importer)
        f.create_dataset(
            "weighted_smooth_l1_localization_loss/code_weights:0",
            data=np.ones(7, np.float32))

        g = f.create_group("pillar_feature_net/sequential")
        dk = rnd(params["pfn"]["dense"]["kernel"].shape)
        g.create_dataset("dense/kernel:0", data=dk)
        params["pfn"]["dense"]["kernel"] = dk
        c = dk.shape[1]
        for keras_name, target, tree in (
                ("gamma", "scale", params), ("beta", "bias", params),
                ("moving_mean", "mean", stats),
                ("moving_variance", "var", stats)):
            a = rnd((c,))
            g.create_dataset(f"batch/{keras_name}:0", data=a)
            tree["pfn"]["bn"][target] = a

        rpn = f.create_group("rpn")
        for bi in (1, 2, 3):
            block = params["rpn"][f"block{bi}"]
            bstats = stats["rpn"][f"block{bi}"]
            n_layers = len([k for k in block if k.startswith("conv")])
            for li in range(n_layers):
                conv = block[f"conv{li}"]
                cdim = conv["depthwise"]["kernel"].shape[3]
                dw = rnd((3, 3, cdim, 1))  # Keras layout
                rpn.create_dataset(
                    f"block{bi}/separable_conv2d_{li}/depthwise_kernel:0",
                    data=dw)
                conv["depthwise"]["kernel"] = np.transpose(dw, (0, 1, 3, 2))
                pw = rnd(conv["pointwise"]["kernel"].shape)
                rpn.create_dataset(
                    f"block{bi}/separable_conv2d_{li}/pointwise_kernel:0",
                    data=pw)
                conv["pointwise"]["kernel"] = pw
                ch = pw.shape[3]
                for keras_name, target, tree in (
                        ("gamma", "scale", block), ("beta", "bias", block),
                        ("moving_mean", "mean", bstats),
                        ("moving_variance", "var", bstats)):
                    a = rnd((ch,))
                    rpn.create_dataset(
                        f"block{bi}/batch_normalization_{li}/{keras_name}:0",
                        data=a)
                    if tree is block:
                        block[f"bn{li}"][target] = a
                    else:
                        bstats[f"bn{li}"][target] = a
        for di in (1, 2, 3):
            dec = params["rpn"][f"deconv{di}"]
            dstats = stats["rpn"][f"deconv{di}"]
            k, _, i, o = dec["deconv"]["kernel"].shape
            kt = rnd((k, k, o, i))  # Keras Conv2DTranspose layout (O, I)
            rpn.create_dataset(f"deconv{di}/conv2d_transpose/kernel:0",
                               data=kt)
            dec["deconv"]["kernel"] = (
                kt if kt.shape == dec["deconv"]["kernel"].shape
                else np.transpose(kt, (0, 1, 3, 2)))
            ch = o
            for keras_name, target, tree in (
                    ("gamma", "scale", dec), ("beta", "bias", dec),
                    ("moving_mean", "mean", dstats),
                    ("moving_variance", "var", dstats)):
                a = rnd((ch,))
                rpn.create_dataset(
                    f"deconv{di}/batch_normalization/{keras_name}:0", data=a)
                if tree is dec:
                    dec["bn"][target] = a
                else:
                    dstats["bn"][target] = a
        for head in ("conv_box", "conv_cls", "conv_dir_cls"):
            hk = rnd(params["rpn"][head]["kernel"].shape)
            hb = rnd(params["rpn"][head]["bias"].shape)
            rpn.create_dataset(f"{head}/kernel:0", data=hk)
            rpn.create_dataset(f"{head}/bias:0", data=hb)
            params["rpn"][head]["kernel"] = hk
            params["rpn"][head]["bias"] = hb
    return expected


class TestH5Import:
    def test_roundtrip_all_leaves(self, tmp_path, rng):
        cfg = small_cfg()
        det = PillarsDetector(cfg)
        variables = det.init(jax.random.PRNGKey(0), batch_size=1)
        path = str(tmp_path / "fake_keras.h5")
        expected = build_fake_keras_h5(path, variables, rng)
        imported = import_reference_h5(path, variables, strict=True)

        flat_e = jax.tree_util.tree_leaves_with_path(expected)
        flat_i = dict(jax.tree_util.tree_leaves_with_path(imported))
        assert len(flat_e) == len(flat_i)
        for key, val in flat_e:
            np.testing.assert_allclose(
                flat_i[key], val, rtol=1e-6,
                err_msg=jax.tree_util.keystr(key))

    def test_missing_weight_raises(self, tmp_path, rng):
        cfg = small_cfg()
        det = PillarsDetector(cfg)
        variables = det.init(jax.random.PRNGKey(0), batch_size=1)
        path = str(tmp_path / "incomplete.h5")
        with h5py.File(path, "w") as f:
            f.create_dataset("rpn/conv_box/kernel:0",
                             data=np.zeros((1, 1, 384, 14), np.float32))
        with pytest.raises(ValueError):
            import_reference_h5(path, variables, strict=True)
