"""DevicePrefetcher lifecycle: error surfacing, shutdown, exhaustion.

The reference delegates this to torch DataLoader workers; our prefetcher
(refign_tpu/data/loader.py) is original machinery, so it gets direct
lifecycle tests rather than goldens.
"""
import time

import pytest

from refign_tpu.data.loader import DevicePrefetcher


def test_producer_error_surfaces_on_next():
    def boom():
        raise ValueError("boom")

    p = DevicePrefetcher(make_batch=boom, put=lambda b: b)
    with pytest.raises(ValueError, match="boom"):
        p.next()
    p.close()


def test_close_does_not_stall_when_error_hits_full_queue():
    """Producer raising while the queue is full must not hang close():
    the err put has to poll the stop event like the ok path does."""
    calls = {"n": 0}

    def make_batch():
        calls["n"] += 1
        if calls["n"] <= 2:
            return calls["n"]
        raise ValueError("late boom")

    p = DevicePrefetcher(make_batch=make_batch, put=lambda b: b, depth=2)
    time.sleep(1.0)  # queue fills with 2 ok items; producer stuck on err
    t0 = time.time()
    p.close()
    assert time.time() - t0 < 3.0, "close() stalled on the error put"
    assert not p._t.is_alive(), "producer thread leaked"


def test_next_raises_after_close_instead_of_deadlocking():
    p = DevicePrefetcher(make_batch=lambda: 1, put=lambda b: b)
    assert p.next() == 1
    p.close()
    with pytest.raises(RuntimeError, match="exhausted"):
        while True:  # drain whatever was buffered, then it must raise
            p.next()


def test_normal_flow():
    p = DevicePrefetcher(make_batch=lambda: 42, put=lambda b: b * 2)
    assert p.next() == 84
    assert p.next() == 84
    p.close()


class _FlakyDataset:
    def __init__(self, n=8, bad=5):
        self.n, self.bad = n, bad

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if i == self.bad:
            raise ValueError("corrupt sample")
        import numpy as np
        return {"image": np.zeros((4, 4, 3), np.uint8)}


def test_dataloader_surfaces_dataset_errors():
    """A corrupt sample must raise in the consumer, not silently end the
    epoch early (regression)."""
    from refign_tpu.data.loader import DataLoader
    loader = DataLoader(_FlakyDataset(), batch_size=2, num_workers=2)
    with pytest.raises(ValueError, match="corrupt sample"):
        for _ in loader:
            pass


def test_dataloader_abandoned_iterator_does_not_leak_producer():
    """Breaking out of iteration early must let the producer thread exit
    (regression: it blocked forever in q.put on the full queue)."""
    import threading

    from refign_tpu.data.loader import DataLoader

    n0 = threading.active_count()
    loader = DataLoader(_FlakyDataset(n=64, bad=-1), batch_size=2,
                        num_workers=2, prefetch=1)
    for _ in range(3):
        it = iter(loader)
        next(it)
        it.close()  # generator finally -> stop.set()
    deadline = time.time() + 10
    while threading.active_count() > n0 and time.time() < deadline:
        time.sleep(0.1)
    assert threading.active_count() <= n0, (
        f"{threading.active_count() - n0} leaked threads")


class _SeqDataset:
    """Deterministic content + a per-sample random draw (proxies the
    RandomCrop/flip/jitter host randomness)."""

    def __init__(self, n=10):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        import random

        import numpy as np
        return {"x": np.full((2, 2), i, np.float32),
                "r": np.float32(random.random())}


def test_process_mode_parity_determinism_and_errors():
    """REFIGN_TPU_LOADER=process (reference num_workers parity:
    worker *processes*, combined_data_module.py + refign_hrda_star.yaml:6).

    - yields the same index batches as thread mode (shuffle is computed
      in the parent)
    - per-batch RNG reseeding: deterministic across runs for a fixed
      seed, decorrelated across batches (fork inherits the parent RNG
      state, so without reseeding every batch replays the same crops)
    - worker exceptions surface in the consumer
    """
    from refign_tpu.data.loader import DataLoader

    def run(mode, seed=7):
        dl = DataLoader(_SeqDataset(), batch_size=3, shuffle=True,
                        num_workers=2, seed=seed, mode=mode)
        idx, rnd = [], []
        for b in dl:
            idx.append(b["x"][:, 0, 0].tolist())
            rnd.append(b["r"].tolist())
        return idx, rnd

    idx_p1, rnd_p1 = run("process")
    idx_p2, rnd_p2 = run("process")
    idx_t, _ = run("thread")
    assert idx_p1 == idx_p2 == idx_t
    assert rnd_p1 == rnd_p2, "process mode must be seed-deterministic"
    assert rnd_p1[0] != rnd_p1[1], "batches must be decorrelated"

    with pytest.raises(ValueError, match="corrupt sample"):
        for _ in DataLoader(_FlakyDataset(), batch_size=2, num_workers=2,
                            mode="process"):
            pass


def test_device_normalize_strips_host_normalize(tmp_path):
    """CombinedDataModule(device_normalize=True): the TRAIN pipeline stops
    at uint8 (ConvertImageDtype + Normalize stripped, settings recorded for
    the device-side step); eval pipelines keep host normalization."""
    import numpy as np
    from PIL import Image

    root = tmp_path / "data"
    rng = np.random.RandomState(0)
    for split in ("train", "val"):
        idir = root / "Cityscapes" / "leftImg8bit" / split / "cityA"
        sdir = root / "Cityscapes" / "gtFine" / split / "cityA"
        idir.mkdir(parents=True, exist_ok=True)
        sdir.mkdir(parents=True, exist_ok=True)
        for i in range(2):
            Image.fromarray(
                rng.randint(0, 255, (64, 128, 3), np.uint8)).save(
                idir / f"a_{i}_leftImg8bit.png")
            Image.fromarray(rng.randint(0, 19, (64, 128), np.uint8)).save(
                sdir / f"a_{i}_gtFine_labelTrainIds.png")

    from refign_tpu.data.module import CombinedDataModule
    tf = [
        {"class_path": "data_modules.transforms.ToTensor"},
        {"class_path": "data_modules.transforms.RandomCrop",
         "init_args": {"size": [32, 32]}},
        {"class_path": "data_modules.transforms.ConvertImageDtype"},
        {"class_path": "data_modules.transforms.Normalize"},
    ]
    lc = {"train": {"Cityscapes": {"load_keys": ["image", "semantic"],
                                   "transforms": [dict(t) for t in tf]}},
          "val": {"Cityscapes": {"load_keys": ["image", "semantic"],
                                 "transforms": [dict(t) for t in tf]}}}
    dm = CombinedDataModule(load_config=lc, batch_size=2, num_workers=1,
                            data_dir=str(root), device_normalize=True)
    dm.setup("fit")
    train_sample = dm.datasets["train"][0][0]
    assert train_sample["image"].dtype == np.uint8, "train must stay uint8"
    assert dm.normalize_settings is not None
    assert dm.normalize_settings["mean"][0] == pytest.approx(0.485)
    val_sample = dm.datasets["val"][0][0]
    assert val_sample["image"].dtype == np.float32, \
        "eval pipeline must keep host normalize"
