"""Training orchestration: epoch loop, per-epoch eval, score-gated
checkpointing.

reference train.py:126-460 (train) + :480-932 (evaluate). The structure is
the same — epochs of jitted steps, full KITTI eval after each epoch, keep
weights iff the aggregate score improves — but the step is one fused XLA
graph and eval inference is batched + pipelined on device.
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from pillars_tpu.config import Config
from pillars_tpu.data.pipeline import BatchIterator, PedestrianDataset
from pillars_tpu.data.sampler import DataBaseSampler
from pillars_tpu.eval import kitti_ap
from pillars_tpu.eval.predict_to_anno import (infos_to_gt_annos,
                                              predictions_to_annos)
from pillars_tpu.eval.proxies import detection_quality_proxies
from pillars_tpu.models.detector import PillarsDetector
from pillars_tpu.train import checkpoint as ckpt
from pillars_tpu.train.metrics import TrainMetricsState
from pillars_tpu.train.loop import (TrainState, create_train_state,
                                    make_train_step)
from pillars_tpu.train.metrics_log import MetricLogger
from pillars_tpu.utils.profiling import StageTimer


class Evaluator:
    """Batched offline eval: dataset -> device inference -> KITTI AP.

    reference evaluate() (train.py:480-932), minus ROS (see data/stream.py
    for the production path)."""

    def __init__(self, cfg: Config, detector: PillarsDetector,
                 measure_time: bool = False, buckets=None):
        self.cfg = cfg
        self.detector = detector
        self.dataset = PedestrianDataset(cfg, cfg.eval_input, training=False)
        self.class_names = list(cfg.eval_input.desired_objects)
        self.measure_time = measure_time
        self.last_proxies: Dict[str, float] = {}
        self._recal_batches = None  # lazily-built host cache (bn_recal)
        # bucketed static-shape dispatch (pillars_tpu/infer.py): batches
        # are sliced host-side to the smallest bucket holding their
        # largest cloud BEFORE device_put, then routed to that bucket's
        # compiled graph by the (now exact) points.shape[1]
        self._bucketed = None
        if buckets is not None:
            from pillars_tpu.infer import BucketedInference

            self._bucketed = BucketedInference(
                cfg, buckets, cfg.eval_input.anchor_area_threshold)
            self.infer = self._bucketed_infer
        else:
            self.infer = detector.make_inference_fn(
                cfg.eval_input.anchor_area_threshold)
        # data-parallel eval: full batches shard over the mesh like the
        # Trainer's (SURVEY §2.4); remainder batches fall back to one device
        self.mesh = None
        n_dev = cfg.runtime.num_devices or len(jax.devices())
        if n_dev > 1 and cfg.eval_input.batch_size % n_dev == 0:
            from pillars_tpu.parallel import make_mesh

            self.mesh = make_mesh(n_dev, cfg.runtime.data_axis)

    def _bucketed_infer(self, variables, points, num_points, rect, trv2c):
        # points was pre-sliced to an exact bucket width in _device_put
        return self._bucketed._fn(points.shape[1])(
            variables, points, num_points, rect, trv2c)

    def _device_put(self, batch):
        if self._bucketed is not None:
            import numpy as _np

            n = int(_np.asarray(batch["num_points"]).max(initial=0))
            b = self._bucketed.select_bucket(n)
            pts = _np.asarray(batch["points"])
            if pts.shape[1] > b:
                batch = dict(batch, points=pts[:, :b])
            elif pts.shape[1] < b:
                # a CLI bucket wider than the dataset's padded width: pad
                # UP so _bucketed_infer keys an exact (warmed) rung —
                # a non-bucket width would compile a new unwarmed graph
                # mid-eval, 2-10 min on the remote TPU (ADVICE r3)
                pad = _np.zeros((pts.shape[0], b - pts.shape[1],
                                 pts.shape[2]), pts.dtype)
                batch = dict(batch,
                             points=_np.concatenate([pts, pad], axis=1))
        if (self.mesh is not None
                and batch["points"].shape[0] % self.mesh.size == 0):
            from pillars_tpu.parallel import shard_batch

            return shard_batch(batch, self.mesh, self.cfg.runtime.data_axis)
        return jax.device_put(batch)

    def _drain(self, entry, dt_annos, timer):
        """Read back one in-flight batch and convert it to annos."""
        preds, image_idx = entry
        with timer.stage("t_predict"):  # device->host wait
            preds = jax.device_get(preds)
        with timer.stage("t_anno"):
            dt_annos += predictions_to_annos(
                preds, image_idx, self.class_names,
                self.cfg.model.postprocess.post_center_limit_range)

    def _maybe_recalibrate(self, variables):
        """AdaBN BN-stat refresh before eval (train/bn_recal.py): the
        train-distribution EMA stats (sampler-pasted, augmented scenes)
        systematically mismatch raw eval scenes — measured score_max 0.16
        vs 0.69 on the same scenes at kitti3 scale (diag_bn_eval_gap.py).
        Recal scenes come from the TRAIN split read through the eval-mode
        (unaugmented) pipeline; no labels are consumed."""
        k = self.cfg.eval_input.bn_recal_batches
        if not k or not variables.get("batch_stats"):
            return variables
        if self._recal_batches is None:
            import numpy as _np

            reader = (self.cfg.train_input
                      if self.cfg.train_input.info_path else
                      self.cfg.eval_input)
            ds = (PedestrianDataset(self.cfg, reader, training=False)
                  if reader is self.cfg.train_input else self.dataset)
            bs = self.cfg.eval_input.batch_size
            batches = []
            for b in BatchIterator(ds, bs, shuffle=False, num_workers=1,
                                   drop_remainder=True):
                batches.append({
                    "points": _np.asarray(b["points"]),
                    "num_points": _np.asarray(b["num_points"])})
                if len(batches) >= k:
                    break
            self._recal_batches = batches
        from pillars_tpu.train.bn_recal import build_recal_fn, recalibrate

        if getattr(self, "_recal_step", None) is None:
            self._recal_step = build_recal_fn(self.cfg)
        return recalibrate(self.cfg, variables, self._recal_batches,
                           step=self._recal_step)

    def run(self, variables, max_samples: Optional[int] = None,
            save_path: Optional[str] = None,
            progress: bool = True) -> Tuple[List[Dict], List[Dict]]:
        """Returns (dt_annos, gt_annos). ``save_path`` pickles the dt_annos
        like the reference's per-epoch result.pkl (train.py:867-873).

        Pipelined with a bounded in-flight window: inference for batch i+k
        is dispatched while batch i's results convert to annos on the host
        (the reference runs these serially per-frame, train.py:752-861).
        Stage timers keep the reference's names (train.py:629-712):
        t_preprocess = host batch build wait, t_network = dispatch,
        t_predict = device->host readback, t_anno = anno conversion."""
        variables = self._maybe_recalibrate(variables)
        batch_size = self.cfg.eval_input.batch_size
        it = BatchIterator(self.dataset, batch_size, shuffle=False,
                           num_workers=self.cfg.eval_input.num_workers,
                           drop_remainder=False,
                           device_put_fn=self._device_put)
        total = (min(len(self.dataset), max_samples) if max_samples
                 else len(self.dataset))
        timer = StageTimer(enabled=self.measure_time)
        if self.measure_time:
            # warm the compiled graph(s) so stage times exclude compilation
            if self._bucketed is not None:
                # every bucket rung, not the (never-dispatched) full width
                self._bucketed.warmup(variables, batch_size=batch_size)
            else:
                mp = self.cfg.model.voxel.max_points
                nf = self.cfg.model.num_point_features
                b = batch_size
                import numpy as _np

                jax.block_until_ready(self.infer(
                    variables, _np.zeros((b, mp, nf), _np.float32),
                    _np.zeros((b,), _np.int32),
                    _np.tile(_np.eye(4, dtype=_np.float32), (b, 1, 1)),
                    _np.tile(_np.eye(4, dtype=_np.float32), (b, 1, 1))))
        dt_annos: List[Dict] = []
        count = 0
        report_every = max(1, (total // batch_size) // 10 or 1)
        pending: List[Tuple] = []
        window = 4  # bounded in-flight depth
        src = iter(it)
        bi = 0
        t_sample = time.perf_counter()
        while True:
            with timer.stage("t_preprocess"):
                batch = next(src, None)
            if batch is None:
                break
            with timer.stage("t_network"):
                preds = self.infer(
                    variables, batch["points"], batch["num_points"],
                    batch["rect"], batch["trv2c"])
            pending.append((preds, batch["image_idx"]))
            if len(pending) > window:
                self._drain(pending.pop(0), dt_annos, timer)
            count += batch["points"].shape[0]
            timer.add("t_full_sample",
                      (time.perf_counter() - t_sample) * 1e3)
            t_sample = time.perf_counter()
            bi += 1
            if progress and bi % report_every == 0:
                pct = min(100, 100 * count // max(total, 1))
                msg = f"[eval] {count}/{total} clouds ({pct}%)"
                if self.measure_time:
                    avgs = timer.averages()
                    msg += "".join(f" {k} {v / batch_size:.2f}ms"
                                   for k, v in sorted(avgs.items()))
                print(msg)
            if max_samples and count >= max_samples:
                break
        while pending:
            self._drain(pending.pop(0), dt_annos, timer)
        if self.measure_time:
            avgs = timer.averages()
            print("per-cloud: " + ", ".join(
                f"{k} {v / batch_size:.2f} ms"
                for k, v in sorted(avgs.items())) + f" ({count} clouds)")
        if save_path:
            with open(save_path, "wb") as f:
                pickle.dump(dt_annos, f, 2)
        if self.cfg.eval_input.no_annos_mode:
            # no labels to score against: predictions only
            # (reference train.py:876-880 exits before AP here)
            return dt_annos, []
        gt_annos = infos_to_gt_annos(self.dataset.infos)[: len(dt_annos)]
        return dt_annos, gt_annos

    def evaluate(self, variables, max_samples: Optional[int] = None,
                 save_path: Optional[str] = None):
        """Returns (result_str, mAPbev, mAP3d, mAPaos, score)."""
        dt_annos, gt_annos = self.run(variables, max_samples, save_path)
        if self.cfg.eval_input.no_annos_mode:
            # reference returns (score 0, "no evaluation") so the caller's
            # gating/logging still works (train.py:879-880)
            self.last_proxies = {}
            return "no evaluation (no_annos_mode)", 0.0, 0.0, 0.0, 0.0
        # detection-quality proxies: visible per-epoch movement long
        # before AP lifts off (eval/proxies.py; VERDICT r4 #6)
        self.last_proxies = detection_quality_proxies(dt_annos, gt_annos)
        result, _, mAPbev, mAP3d, mAPaos = kitti_ap.get_official_eval_result(
            gt_annos, dt_annos, self.class_names, compute_bbox=False)
        score = kitti_ap.aggregate_eval_score(mAP3d, mAPaos, mAPbev)
        return result, mAPbev, mAP3d, mAPaos, score


class Trainer:
    def __init__(self, cfg: Config, use_wandb: bool = False):
        self.cfg = cfg
        self.detector = PillarsDetector(cfg)
        # data-parallel mesh: batches are sharded over the 'data' axis and
        # XLA partitions the fused step + inserts the gradient all-reduce
        # over ICI (a capability the reference lacks, SURVEY §2.4)
        self.mesh = None
        n_dev = cfg.runtime.num_devices or len(jax.devices())
        if n_dev > 1:
            from pillars_tpu.parallel import make_mesh

            if cfg.train_input.batch_size % n_dev:
                raise ValueError(
                    f"batch_size {cfg.train_input.batch_size} not divisible "
                    f"by {n_dev} devices")
            self.mesh = make_mesh(n_dev, cfg.runtime.data_axis)
        self.dirs = ckpt.create_out_dirs(cfg.out_dir, cfg.model_id)
        # archive the full resolved config into the run dir so every run is
        # self-describing (reference copies configs/train.yaml, train.py:158)
        try:
            cfg.to_yaml(os.path.join(self.dirs["model_dir"], "train.yaml"))
        except Exception:
            pass  # yaml unavailable: run proceeds, just un-archived
        self.logger = MetricLogger(self.dirs["logs"], use_wandb=use_wandb,
                                   run_name=f"model_{self.dirs['model_id']}")

        sampler = None
        if cfg.train_input.sampler.info_path:
            sampler = DataBaseSampler(
                cfg.train_input.sampler.info_path, cfg.train_input.sampler,
                rng=np.random.RandomState(cfg.train.seed))
        self.dataset = PedestrianDataset(
            cfg, cfg.train_input, training=True, sampler=sampler,
            rng=np.random.RandomState(cfg.train.seed))
        self.state, self.tx = create_train_state(
            self.detector, jax.random.PRNGKey(cfg.train.seed),
            cfg.train_input.batch_size)
        self.step_fn = make_train_step(self.detector, self.tx,
                                       with_metrics=cfg.train.train_metrics)
        self.tm_state = (TrainMetricsState.init()
                         if cfg.train.train_metrics else None)
        self.evaluator = None
        if cfg.train.do_evaluate and cfg.eval_input.info_path:
            from pillars_tpu.infer import parse_bucket_arg

            self.evaluator = Evaluator(
                cfg, self.detector,
                buckets=parse_bucket_arg(cfg.eval_input.buckets,
                                         cfg.model.voxel.max_points))

        if cfg.train.load_weights:
            params, batch_stats = ckpt.load_params(cfg.train.load_weights)
            self.state = self.state._replace(
                params=params,
                batch_stats=batch_stats or self.state.batch_stats)
        self._start_epoch = 0
        self._best_score = 0.0
        # epoch whose eval/gating was interrupted (resume re-runs it)
        self._pending_eval_epoch: Optional[int] = None

    # ------------------------------------------------------------------
    def resume(self, checkpoint_path: str) -> int:
        """Restore the FULL TrainState (params, BN stats, optimizer moments,
        step counter) — exact mid-training resume, which the reference could
        not do (its optimizer state was only saved in a disabled debug
        branch, train.py:450-460). Also restores the epoch counter and
        best-score gate from the checkpoint ``extra`` so a resumed run
        continues epoch numbering and checkpoint-gating decisions exactly
        where the interrupted run left them. Returns the restored step."""
        state, extra = ckpt.load_checkpoint(checkpoint_path)
        if isinstance(state, dict):  # params-only checkpoint
            self.state = self.state._replace(
                params=state["params"],
                batch_stats=state.get("batch_stats")
                or self.state.batch_stats)
        else:
            self.state = TrainState(*state)
        self._start_epoch = int(extra.get("epoch", -1)) + 1
        self._best_score = float(
            extra.get("best_score", extra.get("score", 0.0)))
        # the pre-eval temp checkpoint carries evaluated=False; if the run
        # died DURING the eval, re-run that epoch's eval + gating first so
        # the resumed run reproduces the uninterrupted gating decisions
        self._pending_eval_epoch = (self._start_epoch - 1
                                    if not extra.get("evaluated", True)
                                    else None)
        return int(jax.device_get(self.state.step))

    # ------------------------------------------------------------------
    def variables(self):
        return {"params": self.state.params,
                "batch_stats": self.state.batch_stats}

    # ------------------------------------------------------------------
    def train(self, epochs: Optional[int] = None,
              eval_max_samples: Optional[int] = None,
              overfit_first_batch: bool = False,
              replay_batch_file: Optional[str] = None,
              save_batch_file: Optional[str] = None,
              fixture_repeats: int = 100) -> float:
        """Debug fixtures mirror the reference test strategy (SURVEY §4):
        ``overfit_first_batch`` repeats the first batch 100x per epoch
        (reference take_first, train.py:249), ``replay_batch_file`` trains on
        one pickled batch (from_file_mode, train.py:248-256),
        ``save_batch_file`` records the first batch for later replay."""
        cfg = self.cfg
        epochs = epochs if epochs is not None else cfg.train.epochs_total
        batch_size = cfg.train_input.batch_size
        best_score = self._best_score
        step_count = int(jax.device_get(self.state.step))

        # H2D prefetch: the pipeline's background producer puts each batch
        # on device (sharded over the mesh when one exists) so the transfer
        # overlaps the previous step's compute (SURVEY §2.4 capability;
        # replaces tf.data prefetch-to-device).
        if self.mesh is not None:
            from pillars_tpu.parallel import shard_batch

            def _put(b):
                return shard_batch(b, self.mesh, self.cfg.runtime.data_axis)
        else:
            _put = jax.device_put

        # an interrupted epoch-eval restored by resume(): re-run it first
        if self._pending_eval_epoch is not None and self.evaluator is not None:
            best_score = self._eval_and_gate(
                self._pending_eval_epoch, best_score, eval_max_samples)
            self._pending_eval_epoch = None

        fixed_batch = None
        if replay_batch_file:
            with open(replay_batch_file, "rb") as f:
                fixed_batch = pickle.load(f)

        for epoch in range(self._start_epoch, epochs):
            if fixed_batch is not None:
                it = [_put(fixed_batch)] * fixture_repeats
            elif overfit_first_batch:
                first = next(iter(BatchIterator(
                    self.dataset, batch_size, shuffle=False, num_workers=1)))
                it = [_put(first)] * fixture_repeats
            else:
                it = BatchIterator(
                    self.dataset, batch_size, shuffle=cfg.train_input.shuffle,
                    num_workers=cfg.train_input.num_workers,
                    prefetch_depth=cfg.train_input.prefetch_depth,
                    device_put_fn=_put,
                    seed=cfg.train.seed + epoch)
            t_epoch = time.time()
            for batch in it:
                if save_batch_file and step_count == 0:
                    with open(save_batch_file, "wb") as f:
                        pickle.dump(jax.device_get(batch), f, 2)
                if self.tm_state is not None:
                    self.state, self.tm_state, metrics, tm_values = \
                        self.step_fn(self.state, self.tm_state, batch)
                else:
                    self.state, metrics = self.step_fn(self.state, batch)
                    tm_values = None
                if step_count % cfg.train.log_every_steps == 0:
                    self.logger.log_train_step(step_count, epoch, metrics,
                                               extra=tm_values)
                if step_count % cfg.train.print_every_steps == 0:
                    print(f"[train] epoch {epoch} step {step_count} "
                          f"loss {float(metrics.loss):.4f} "
                          f"lr {float(metrics.learning_rate):.6f}")
                step_count += 1
            print(f"[train] epoch {epoch} done in {time.time()-t_epoch:.1f}s")

            if self.evaluator is not None:
                best_score = self._eval_and_gate(epoch, best_score,
                                                 eval_max_samples)
        self._best_score = best_score
        return best_score

    # ------------------------------------------------------------------
    def _eval_and_gate(self, epoch: int, best_score: float,
                       eval_max_samples: Optional[int]) -> float:
        """Per-epoch eval + score-gated checkpoint retention (reference
        train.py:403-440). The pre-eval temp checkpoint carries
        evaluated=False so a kill DURING the eval resumes by re-running it
        (resume()); after gating the temp is always rewritten with
        evaluated=True and the updated gate."""
        step_count = int(jax.device_get(self.state.step))
        ckpt.save_checkpoint(
            os.path.join(self.dirs["checkpoints"], "weights_temp.pkl"),
            self.state,
            extra={"epoch": epoch, "best_score": best_score,
                   "evaluated": False})
        result, bev, d3, aos, score = self.evaluator.evaluate(
            self.variables(), max_samples=eval_max_samples,
            save_path=os.path.join(self.dirs["results"],
                                   f"result_{epoch}.pkl"))
        self.logger.log_eval(step_count, d3, aos, bev, score,
                             extra=getattr(self.evaluator,
                                           "last_proxies", None))
        print(f"[eval] epoch {epoch} score {score:.2f} "
              f"(best {best_score:.2f})")
        with open(os.path.join(self.dirs["results"],
                               f"model_result_{epoch}.txt"), "w") as f:
            f.write(result)
        if score > best_score:
            best_score = score
            ckpt.save_checkpoint(
                os.path.join(self.dirs["checkpoints"],
                             f"weights_{epoch}.pkl"),
                self.state, extra={"score": score, "epoch": epoch,
                                   "best_score": best_score})
        # refresh the temp ckpt so a resume after this point reproduces
        # the uninterrupted gating decisions (and clears evaluated=False)
        ckpt.save_checkpoint(
            os.path.join(self.dirs["checkpoints"], "weights_temp.pkl"),
            self.state,
            extra={"epoch": epoch, "best_score": best_score,
                   "evaluated": True})
        return best_score
