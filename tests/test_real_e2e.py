"""--data_type real end-to-end through the CLI (one of the five driver
benchmark configs, BASELINE.md).

Covers: the real split rule (every 8th sample offset 4 is test, reference
model/worker.py:169-176), sgm_disp loading (reference data/dataset.py real
branch), the SGM warmup loss terms with their epoch gate (reference
single_frame_worker.py:157-163), and retest on the trained params.
"""
import json

import numpy as np
import pytest

from depthinspace_tpu.data.fixture import generate_dataset


@pytest.fixture(scope="module")
def real_run(tmp_path_factory, monkeypatch_module):
    root = tmp_path_factory.mktemp("real")
    data_dir = root / "dataset"
    out_dir = root / "output"
    # focal/baseline chosen so GT disparity sits around the reference's SGM
    # validity threshold (>30 px, sgm_valid_threshold) at fixture scale
    generate_dataset(data_dir, n_samples=10, imsize=(64, 112), seed=11,
                     focal=300.0, baseline=0.35, write_sgm=True)

    cfg = root / "config.json"
    cfg.write_text(json.dumps({"OUTPUT_DIR": str(out_dir),
                               "DATA_DIR": str(data_dir)}))
    import depthinspace_tpu.config as config_mod
    monkeypatch_module.setattr(config_mod, "DEFAULT_CONFIG_PATH", str(cfg))

    import train_val
    train_val.main(["--cmd", "retrain", "--architecture", "single_frame",
                    "--data_type", "real", "--epochs", "2",
                    "--warmup_epochs", "1", "--train_batch_size", "2"])
    return root, out_dir


@pytest.fixture(scope="module")
def monkeypatch_module():
    from _pytest.monkeypatch import MonkeyPatch
    mp = MonkeyPatch()
    yield mp
    mp.undo()


def test_real_split_rule(real_run):
    """9 train / 1 test under the every-8th-offset-4 rule for 10 samples."""
    root, out_dir = real_run
    log = (out_dir / "single_frame" / "train.log").read_text()
    assert "Train epoch 0" in log and "Train epoch 1" in log


def test_sgm_warmup_terms_and_gate(real_run):
    root, out_dir = real_run
    metrics = json.loads((out_dir / "single_frame" / "metrics.json").read_text())
    # train loss vector: 4 photometric + smooth + geometric + 4 SGM terms
    l0 = metrics["0"]["train"]["loss"]
    l1 = metrics["1"]["train"]["loss"]
    assert len(l0) == 10 and len(l1) == 10
    # epoch 0 < warmup_epochs=1: SGM terms active (L1 to noisy SGM > 0)
    assert all(v > 0 for v in l0[6:]), l0
    # epoch 1 >= warmup_epochs: gate closes the SGM terms exactly
    assert all(v == 0 for v in l1[6:]), l1
    # eval loss vector has no SGM terms (train-only, reference :157)
    tl0 = metrics["0"]["test"]["0"]["loss"]
    assert len(tl0) == 6


def test_real_retest(real_run):
    root, out_dir = real_run
    import train_val
    train_val.main(["--cmd", "retest", "--epoch", "1",
                    "--architecture", "single_frame", "--data_type", "real",
                    "--epochs", "2", "--warmup_epochs", "1",
                    "--train_batch_size", "2"])
    metrics = json.loads((out_dir / "single_frame" / "metrics.json").read_text())
    t = metrics["1"]["test"]["0"]
    for key in ("dist2_mean", "of1"):
        assert key in t, t.keys()
