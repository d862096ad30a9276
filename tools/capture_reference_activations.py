"""Capture stage-by-stage activations from the REFERENCE implementation.

Run this in the reference's own environment (TF 2.2 + numba + ROS-less),
NOT in the TPU image (which has no TF-GPU/numba-CUDA):

    python tools/capture_reference_activations.py \
        --reference /path/to/3D-Object-Detection-for-autonomous-navigation \
        --config configs/train.yaml \
        --weights out/model_345/out_dir_checkpoints/model_weights_48.h5 \
        --cloud my_cloud.npy \
        --out reference_activations.npz

It taps the reference forward pass at every stage boundary
(reference voxelnet.py:850-905: voxel_feature_extractor ->
middle_feature_extractor -> rpn -> predict) and writes one npz consumed by
tests/test_reference_parity.py, which then drives the SAME cloud through
pillars_tpu with the SAME imported .h5 weights and diffs stage by stage.

Captured arrays:
    points            [N, 3/4] the input cloud (pre-voxelization)
    voxels            [P, 50, D] reference points_to_voxel output
    coors             [P, 3] (z, y, x) reverse-index coords
    num_points        [P]
    voxel_features    [P, 128] PFN output (post max-pool)
    spatial_features  [1, C, ny, nx] scatter canvas (reference NCHW)
    box_preds         [1, ny, nx, 14]
    cls_preds         [1, ny, nx, 2]
    dir_cls_preds     [1, ny, nx, 4]
    anchors           [A, 7]
    pred_boxes_lidar  [K, 7] final decode-order boxes (pre camera transform)
    pred_scores       [K]

No reference code is vendored here — this script IMPORTS the reference at
runtime from --reference and only drives its public call surface.
"""

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", required=True,
                    help="path to the reference repo checkout")
    ap.add_argument("--config", default="configs/train.yaml")
    ap.add_argument("--weights", required=True,
                    help=".h5 checkpoint relative to the reference root")
    ap.add_argument("--cloud", required=True,
                    help=".npy [N,3|4] pointcloud in lidar coords; captured "
                         "UNSHUFFLED so voxel assignment is deterministic")
    ap.add_argument("--out", default="reference_activations.npz")
    args = ap.parse_args()

    sys.path.insert(0, args.reference)
    import yaml
    import tensorflow as tf
    import load_data
    from model.voxelnet import VoxelNet

    with open(f"{args.reference}/{args.config}") as f:
        config = yaml.load(f, Loader=yaml.FullLoader)
    mcfg = config["model"]["second"]
    vg = mcfg["voxel_generator"]

    points = np.load(args.cloud).astype(np.float32)

    # voxelize exactly as the eval path does (reference load_data.py:2966,
    # reverse_index True -> zyx coords); NO host shuffle so the TPU twin
    # can replicate first-come-first-kept assignment bit-for-bit
    voxels, coors, num_points = load_data.points_to_voxel(
        points,
        np.array(vg["voxel_size"], dtype=np.float32),
        np.array(vg["point_cloud_range"], dtype=np.float32),
        int(vg["max_number_of_points_per_voxel"]),
        True,
        int(mcfg["max_number_of_voxels"]),
    )

    # anchors: same generator the data pipeline runs per sample
    anchors = load_data.generate_anchors(config)["anchors"].reshape(-1, 7)

    net = VoxelNet(config, None, training=False)
    coors_pad = np.pad(coors, ((0, 0), (1, 0)), mode="constant")  # batch idx
    example = {
        "voxels": tf.constant(voxels),
        "num_points": tf.constant(num_points),
        "coordinates": tf.constant(coors_pad),
        "anchors": tf.constant(anchors[None]),
    }
    # one forward builds the Keras variables, then load (the reference's
    # deferred-load workaround, train.py:719-738)
    _ = net(example["voxels"], example["num_points"],
            example["coordinates"], example["anchors"])
    net.load_weights(f"{args.reference}/{args.weights}")

    voxel_features = net.voxel_feature_extractor(
        example["voxels"], example["num_points"], example["coordinates"])
    spatial_features = net.middle_feature_extractor(
        voxel_features, example["coordinates"])
    preds_dict = net.rpn(spatial_features)

    # predict() indexes `example` positionally and calls .numpy() on each
    # slot (reference voxelnet.py:1060-1074): [3]=rect [4]=Trv2c [5]=P2
    # [6]=anchors [7]=anchors_mask [8]=image_idx [9]=image_shape
    eye = tf.constant(np.eye(4, dtype=np.float32)[None])
    example_t = [
        example["voxels"], example["num_points"], example["coordinates"],
        eye, eye, eye,
        tf.constant(anchors[None]),
        tf.constant(np.ones((1, anchors.shape[0]), np.uint8)),
        tf.constant(np.array([0])),
        tf.constant(np.array([[375, 1242]])),
    ]
    preds = net.predict(example_t, preds_dict)[0]

    np.savez_compressed(
        args.out,
        points=points,
        voxels=np.asarray(voxels),
        coors=np.asarray(coors),
        num_points=np.asarray(num_points),
        voxel_features=np.asarray(voxel_features),
        spatial_features=np.asarray(spatial_features),
        box_preds=np.asarray(preds_dict["box_preds"]),
        cls_preds=np.asarray(preds_dict["cls_preds"]),
        dir_cls_preds=np.asarray(preds_dict["dir_cls_preds"]),
        anchors=anchors,
        pred_boxes_lidar=np.asarray(preds["box3d_lidar"]),
        pred_scores=np.asarray(preds["scores"]),
    )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
