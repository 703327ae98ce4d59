"""Prove the host input pipeline can feed the chip (VERDICT r3 missing #3).

The reference feeds its GPU from 4 torch DataLoader worker *processes*
(configs/cityscapes_acdc/refign_hrda_star.yaml:6 num_workers: 4); we use
worker threads/processes in refign_tpu.data.loader.  At a 277 ms train
step with batch 2+2 the host must sustain ~14 img/s of ~2MP PNG
decode + transform (RandomCrop with the cat_max_ratio re-crop loop,
flips, fp32 normalize) — this tool generates a synthetic
Cityscapes/ACDC-shaped dataset at full production resolution (random
noise, i.e. WORST-case PNG decode entropy), runs the real
CombinedDataModule train pipeline (RCS on, full transform stack), and
measures sustained merged-batch throughput vs. the step-time budget.

Usage: python tools/bench_host_pipeline.py [--n 24] [--batches 40]
       [--crop 512] [--step-ms 277] [--workers 4] [--mode thread|process]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _blobby_labels(rng, h, w, k=8):
    """Large-rectangle label maps: realistic class statistics so the
    cat_max_ratio re-crop loop and RCS actually engage (uniform noise
    labels would never trip either)."""
    sem = np.full((h, w), 255, np.uint8)
    sem[:] = rng.randint(0, 19)
    for _ in range(k):
        c = rng.randint(0, 19)
        y0, x0 = rng.randint(0, h // 2), rng.randint(0, w // 2)
        y1, x1 = y0 + rng.randint(h // 4, h // 2), x0 + rng.randint(
            w // 4, w // 2)
        sem[y0:y1, x0:x1] = c
    return sem


def make_dataset(root, n):
    from PIL import Image
    rng = np.random.RandomState(0)
    cs = os.path.join(root, "Cityscapes")
    img_dir = os.path.join(cs, "leftImg8bit", "train", "cityA")
    sem_dir = os.path.join(cs, "gtFine", "train", "cityA")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(sem_dir, exist_ok=True)
    stats, swc = [], {}
    for i in range(n):
        img = rng.randint(0, 255, size=(1024, 2048, 3), dtype=np.uint8)
        sem = _blobby_labels(rng, 1024, 2048)
        ipath = os.path.join(img_dir, f"a_{i:03d}_leftImg8bit.png")
        spath = os.path.join(sem_dir,
                             f"a_{i:03d}_gtFine_labelTrainIds.png")
        Image.fromarray(img).save(ipath)
        Image.fromarray(sem).save(spath)
        classes, counts = np.unique(sem, return_counts=True)
        entry = {"file": spath}
        for c, cnt in zip(classes.tolist(), counts.tolist()):
            if c == 255:
                continue
            entry[str(c)] = cnt
            swc.setdefault(str(c), []).append([spath, cnt])
        stats.append(entry)
    with open(os.path.join(cs, "sample_class_stats.json"), "w") as f:
        json.dump(stats, f)
    with open(os.path.join(cs, "samples_with_class.json"), "w") as f:
        json.dump(swc, f)

    acdc = os.path.join(root, "ACDC")
    for cond in ("fog",):
        idir = os.path.join(acdc, "rgb_anon", cond, "train", "r0")
        rdir = os.path.join(acdc, "rgb_anon", cond, "train_ref", "r0")
        os.makedirs(idir, exist_ok=True)
        os.makedirs(rdir, exist_ok=True)
        for i in range(n):
            img = rng.randint(0, 255, size=(1080, 1920, 3), dtype=np.uint8)
            ref = rng.randint(0, 255, size=(1080, 1920, 3), dtype=np.uint8)
            Image.fromarray(img).save(
                os.path.join(idir, f"f_{i:03d}_rgb_anon.png"))
            Image.fromarray(ref).save(
                os.path.join(rdir, f"f_{i:03d}_rgb_ref_anon.png"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/refign_host_bench_data")
    ap.add_argument("--n", type=int, default=24, help="images per dataset")
    ap.add_argument("--batches", type=int, default=40)
    ap.add_argument("--crop", type=int, default=512)
    ap.add_argument("--batch-size", type=int, default=4,
                    help="combined batch size (2 src + 2 trg at 4)")
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--step-ms", type=float, default=277.0,
                    help="train-step budget to compare against")
    ap.add_argument("--mode", default=None, choices=(None, "thread",
                                                     "process"),
                    help="override REFIGN_TPU_LOADER mode")
    args = ap.parse_args()

    if args.mode:
        os.environ["REFIGN_TPU_LOADER"] = args.mode
    if not os.path.exists(os.path.join(args.root, "Cityscapes",
                                       "samples_with_class.json")):
        print(f"generating synthetic 2MP dataset under {args.root} ...",
              file=sys.stderr, flush=True)
        make_dataset(args.root, args.n)

    from refign_tpu.data.loader import InfiniteLoader
    from refign_tpu.data.module import CombinedDataModule

    crop = [args.crop, args.crop]
    load_config = {
        "train": {
            "Cityscapes": {
                "rcs_enabled": True,
                "rcs_min_crop_ratio": 0.5 if args.crop <= 512 else 2.0,
                "load_keys": ["image", "semantic"],
                "transforms": [
                    {"class_path": "data_modules.transforms.ToTensor"},
                    {"class_path": "data_modules.transforms.RandomCrop",
                     "init_args": {"size": crop, "cat_max_ratio": 0.75}},
                    {"class_path":
                     "data_modules.transforms.RandomHorizontalFlip"},
                    {"class_path":
                     "data_modules.transforms.ConvertImageDtype"},
                    {"class_path": "data_modules.transforms.Normalize"},
                ],
            },
            "ACDC": {
                "condition": ["fog"],
                "load_keys": ["image", "image_ref"],
                "transforms": [
                    {"class_path": "data_modules.transforms.ToTensor"},
                    {"class_path": "data_modules.transforms.RandomCrop",
                     "init_args": {"size": crop}},
                    {"class_path":
                     "data_modules.transforms.RandomHorizontalFlip"},
                    {"class_path":
                     "data_modules.transforms.ConvertImageDtype"},
                    {"class_path": "data_modules.transforms.Normalize"},
                ],
            },
        },
    }
    # device_normalize=False: this tool measures the REFERENCE-parity host
    # pipeline (fp32 ConvertImageDtype + Normalize on the host), matching
    # the recorded artifact; the production default moves that to device
    dm = CombinedDataModule(load_config=load_config, batch_size=args.batch_size,
                            num_workers=args.workers, data_dir=args.root,
                            device_normalize=False)
    dm.setup("fit")
    loaders = dm.train_dataloaders(seed=0)
    iters = [iter(InfiniteLoader(l)) for l in loaders]

    # warmup (thread pools spin up, PIL caches, RCS engages)
    for _ in range(4):
        dm.merge_train_batch([next(it) for it in iters])

    t0 = time.perf_counter()
    n_img = 0
    for _ in range(args.batches):
        b = dm.merge_train_batch([next(it) for it in iters])
        n_img += (b["image_src"].shape[0] + b["image_trg"].shape[0]
                  + b.get("image_ref", np.empty((0,))).shape[0])
    dt = time.perf_counter() - t0
    ms_per_batch = dt / args.batches * 1e3

    # per-image serial cost decomposition: on an N-core production host
    # (a v5e host exposes dozens of vCPUs per chip) the pipeline scales
    # with worker processes, so the portable number is serial ms/image ->
    # cores needed to hit the step budget (this box has os.cpu_count()
    # cores; with 1 core no pool can beat serial cost)
    probe = {}
    for name, ds in (("Cityscapes", dm.datasets["train"][0]),
                     ("ACDC", dm.datasets["train"][1])):
        t = time.perf_counter()
        reps = 6
        for i in range(reps):
            ds[i % len(ds)]
        probe[name] = (time.perf_counter() - t) / reps * 1e3
    imgs_per_step = args.batch_size // 2 * 3  # src + trg + ref
    serial_ms_per_step = (args.batch_size // 2 * probe["Cityscapes"]
                          + args.batch_size // 2 * probe["ACDC"])
    need = args.step_ms
    print(json.dumps({
        "metric": "host_pipeline_batch_time",
        "value": round(ms_per_batch, 1),
        "unit": "ms/merged-batch",
        "mode": os.environ.get("REFIGN_TPU_LOADER", "thread"),
        "workers": args.workers,
        "host_cores": os.cpu_count(),
        "crop": args.crop,
        "img_per_s": round(n_img / dt, 2),
        "step_budget_ms": need,
        "headroom_x": round(need / ms_per_batch, 2),
        "serial_sample_ms": {k: round(v, 1) for k, v in probe.items()},
        "imgs_per_step": imgs_per_step,
        "cores_needed_for_budget": round(serial_ms_per_step / need, 1),
        "verdict": ("feeds the chip" if ms_per_batch < need
                    else "HOST-BOUND: chip would starve"),
    }), flush=True)


if __name__ == "__main__":
    main()
