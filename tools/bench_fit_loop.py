"""Measure sustained train-step time through the PRODUCTION fit loop.

The r3 train-step artifacts came from chained probe windows
(tools/bench_core_parts.py full_step); a 60-iteration window read 40%
higher than the 8/30-iteration windows and the discrepancy was left
unresolved (VERDICT r3 weak #1).  A real 40k-step run is a long window,
so this tool runs `SegTask.fit` itself — the exact production path:
DevicePrefetcher -> jit_prefix -> jit_core -> FitBookkeeper logging —
on synthetic in-memory data for hundreds of consecutive steps and
reports the steady-state ms/step between consecutive log barriers
(each FitBookkeeper log line fetches the loss scalars d2h, a true
relay barrier; its cumulative `sps` field lets us recover per-window
times without instrumenting the loop).

Usage:
  python tools/bench_fit_loop.py --config configs/cityscapes_acdc/refign_daformer.yaml \
      [--steps 150] [--log-every 25] [--pool 6]
  python tools/bench_fit_loop.py --config configs/cityscapes_acdc/refign_hrda_star.yaml ...
"""
import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _strip_pretrained(node):
    if isinstance(node, dict):
        node.pop("pretrained", None)
        for v in node.values():
            _strip_pretrained(v)
    elif isinstance(node, list):
        for v in node:
            _strip_pretrained(v)


class SyntheticDataModule:
    """Minimal stand-in exposing exactly the surface SegTask.fit touches.

    Pre-generates a pool of host batches shaped like the real merged
    Cityscapes+ACDC batch (image_src/semantic_src/image_trg/image_ref)
    and cycles them; host-side input cost is near zero by design — the
    host *pipeline* is measured separately (tools/bench_host_pipeline.py).
    """

    def __init__(self, batch_per_source: int, size: int, refign: bool,
                 pool: int = 6, drop_half: bool = False, seed: int = 0,
                 device_normalize: bool = False):
        rng = np.random.RandomState(seed)
        B, S = batch_per_source, size
        self.ignore_every_second_semantic_training_batch = drop_half
        self.batch_size = 2 * B
        self.device_normalize = device_normalize
        if device_normalize:
            self.normalize_settings = {"mean": (0.485, 0.456, 0.406),
                                       "std": (0.229, 0.224, 0.225)}

        def img():
            if device_normalize:  # host ships uint8, step normalizes
                return rng.randint(0, 256, (B, S, S, 3)).astype(np.uint8)
            return rng.randn(B, S, S, 3).astype(np.float32)

        # FitBookkeeper fires one final val at max_steps; expose an empty
        # val surface so evaluate() is a no-op instead of a crash
        self.stage_on = {"train": ["Cityscapes", "ACDC"], "val": []}
        self.datasets = {}
        self._pool = []
        for _ in range(pool):
            src = {"image": img(),
                   "semantic": rng.randint(0, 19, size=(B, S, S))}
            trg = {"image": img()}
            if refign:
                trg["image_ref"] = img()
            self._pool.append([src, trg])

    def setup(self, stage):
        pass

    def eval_dataloaders(self, stage):
        return []

    def train_dataloaders(self, seed=0):
        # fit() zips per-loader iterators; expose src and trg streams
        n = len(self._pool)
        src_stream = [self._pool[i % n][0] for i in range(n)]
        trg_stream = [self._pool[i % n][1] for i in range(n)]
        return [src_stream, trg_stream]

    # real implementation: data/module.py merge_train_batch — reuse it
    def merge_train_batch(self, sub_batches, drop_half=True):
        from refign_tpu.data.module import CombinedDataModule
        return CombinedDataModule.merge_train_batch(
            self, sub_batches, drop_half=drop_half)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--log-every", type=int, default=25,
                    help="barrier cadence (production default is 50)")
    ap.add_argument("--pool", type=int, default=6)
    ap.add_argument("--size", type=int, default=None,
                    help="override crop size (default: read RandomCrop "
                    "from the config)")
    ap.add_argument("--backbone-type", default=None,
                    help="override the student backbone model_type "
                    "(smoke-testing the tool on CPU with mit_b0)")
    ap.add_argument("--device-norm", action="store_true",
                    help="uint8 host batches + on-device normalize "
                    "(CombinedDataModule device_normalize=True parity): "
                    "4x fewer h2d bytes per step")
    args = ap.parse_args()

    import refign_tpu  # noqa: F401
    from refign_tpu.config import (init_args, load_yaml, parse_optimizer,
                                   parse_scheduler)
    from refign_tpu.tasks.seg_task import SegTask

    cfg = load_yaml(args.config)
    margs = init_args(cfg["model"])
    _strip_pretrained(margs)
    if args.backbone_type:
        margs["backbone"]["init_args"]["model_type"] = args.backbone_type

    # geometry from the config's train RandomCrop
    size = args.size
    train_cfg = cfg["data"]["init_args"]["load_config"]["train"]
    if size is None:
        for ds in train_cfg.values():
            for t in ds.get("transforms", []):
                if str(t.get("class_path", "")).endswith("RandomCrop"):
                    size = int(t["init_args"]["size"][0])
    batch_per_source = (int(cfg["data"]["init_args"]["batch_size"])
                        // max(len(train_cfg), 1))
    drop_half = bool(cfg["data"]["init_args"].get(
        "ignore_every_second_semantic_training_batch", False))

    trainer_cfg = dict(cfg.get("trainer") or {})
    trainer_cfg["max_steps"] = args.steps
    trainer_cfg["val_every_n_steps"] = 10 ** 9  # no val in the window
    trainer_cfg["log_every_n_steps"] = args.log_every
    trainer_cfg.pop("callbacks", None)

    opt = parse_optimizer(cfg.get("optimizer", {}))
    sched = parse_scheduler(cfg.get("lr_scheduler", {}),
                            trainer_cfg.get("max_steps"))

    refign = bool(margs.get("use_refign", False)
                  or margs.get("alignment_head"))
    dm = SyntheticDataModule(batch_per_source, size, refign,
                             pool=args.pool, drop_half=drop_half,
                             device_normalize=args.device_norm)
    task = SegTask(margs, opt, sched, trainer_cfg, dm)

    workdir = tempfile.mkdtemp(prefix="bench_fit_")
    t0 = time.time()
    task.fit(workdir, seed=0)
    wall = time.time() - t0

    # recover per-window times from the production log's cumulative sps
    entries = []
    with open(os.path.join(workdir, "metrics.jsonl")) as f:
        for line in f:
            d = json.loads(line)
            if "sps" in d:
                entries.append((d["step"], d["step"] / d["sps"]))
    windows = []
    for (s0, t0_), (s1, t1_) in zip(entries, entries[1:]):
        windows.append({"steps": f"{s0}-{s1}",
                        "ms_per_step": round((t1_ - t0_) / (s1 - s0) * 1e3,
                                             1)})
    steady = sorted(w["ms_per_step"] for w in windows[1:]) or [float("nan")]
    median = steady[len(steady) // 2]
    print(json.dumps({
        "metric": "fit_loop_train_step_time",
        "value": median,
        "unit": "ms/step (median steady-state window)",
        "config": os.path.basename(args.config),
        "geometry": f"{size}^2 b{batch_per_source}+{batch_per_source}"
                    f"{' drop-half' if drop_half else ''}"
                    f"{' device-norm-uint8' if args.device_norm else ''}",
        "log_every": args.log_every,
        "windows": windows,
        "total_wall_s": round(wall, 1),
        "hours_for_40k_steps": round(40000 * median / 3600 / 1e3, 2),
    }, indent=None), flush=True)


if __name__ == "__main__":
    main()
