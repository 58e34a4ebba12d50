"""Day-one real-data workflow, rehearsed end-to-end (VERDICT r4 missing-2).

The whole parity story hinges on the day a user has the real Toronto
`mnist_test_seq.npy` plus a bank of real digit crops.  This test stages that
day with synthetic stand-ins — a held-out sprite bank playing "real MNIST
crops", and a canonical-format time-major file generated FROM that bank
playing the Toronto download — and drives the recommended config through the
exact user-facing chain:

    fit() with data.sprite_bank set  ->  guard warns, trains, evals against
    the canonical val split  ->  `mmvae eval --ema`  ->  `mmvae sample --ema`

plus the guard's fail path (no bank while an eval against canonical data is
coming).  Runbook: README.md "When you have the real file".
"""

import json
import os

import numpy as np
import pytest

from mmvae_tpu.data.loader import generate_moving_mnist


def _overrides(canon, bank, ckpt_dir):
    """Recommended config (seq_vae + ongen + EMA + fast_mid), CPU-sized."""
    ovs = [
        f"data.path={canon}",
        "data.on_device_generate=true",
        "data.seq_len=4",
        "data.batch_size=4",
        "data.num_digits=2",
        # tiny model: the workflow, not the quality point, is under test
        "model.kwargs.latent_dim=8",
        "model.kwargs.enc_channels=4,8",
        "model.kwargs.lstm_features=8",
        "model.kwargs.dec_upsample=fast_mid",
        "model.dtype=float32",
        "optim.ema_decay=0.99",
        "optim.lr=3e-3",
        "train.steps=6",
        "train.log_every=2",
        "train.eval_every=3",
        "train.eval_batches=2",
        "train.checkpoint_every=3",
        f"train.checkpoint_dir={ckpt_dir}",
        "train.data_parallel=false",
    ]
    if bank is not None:
        ovs.append(f"data.sprite_bank={bank}")
    return ovs


def test_day_one_real_data_workflow(tmp_path, capsys):
    # --- the user's two real files, staged synthetically ----------------
    # A held-out sprite bank: stands in for real MNIST digit crops.  Built
    # from rng noise (NOT the font table) so train data provably flows from
    # the user's bank, and stored as uint8 like real crops would be.
    rng = np.random.default_rng(42)
    bank_arr = (rng.random((3, 8, 8)) * 255).astype(np.uint8)
    bank = tmp_path / "digit_crops.npy"
    np.save(bank, bank_arr)

    # The canonical file: time-major (T, N, 64, 64) uint8 — generated from
    # the SAME bank, exactly the matched-distribution day-one situation.
    clips = generate_moving_mnist(
        24, seq_len=20, sprites=bank_arr.astype(np.float32) / 255.0, seed=7
    )
    canon = tmp_path / "mnist_test_seq.npy"
    np.save(canon, np.ascontiguousarray(clips.transpose(1, 0, 2, 3)))

    ckpt_dir = tmp_path / "ck"

    # --- guard: forgetting the bank fails loudly BEFORE training --------
    from mmvae_tpu.configs import get_config
    from mmvae_tpu.train.loop import fit

    cfg_nobank = get_config(
        "seq_vae", tuple(_overrides(canon, None, ckpt_dir))
    )
    with pytest.raises(ValueError, match="sprite_bank"):
        fit(cfg_nobank)
    assert not os.path.isdir(ckpt_dir), "guard must fire before any training"

    # --- train: `mmvae train` with the bank ------------------------------
    from mmvae_tpu import cli

    ovs = _overrides(canon, bank, ckpt_dir)
    argv = ["train", "--config", "seq_vae"]
    for o in ovs:
        argv += ["--set", o]
    assert cli.main(argv) == 0
    captured = capsys.readouterr()
    # The train/val-distribution choice is surfaced, and in-training eval
    # against the canonical val split ran.
    assert "sprite_bank" in captured.err
    assert "val_loss" in captured.out

    # --- eval: `mmvae eval --ema` off the checkpoint ---------------------
    argv = ["eval", "--config", "seq_vae", "--ckpt", str(ckpt_dir), "--ema"]
    for o in ovs:
        argv += ["--set", o]
    assert cli.main(argv) == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["step"] == 6
    # canonical val split = 24 - int(24 * 0.9) = 3 clips, walked exactly once
    assert result["samples"] == 3
    assert np.isfinite(result["val_loss"])
    assert np.isfinite(result["val_bce"]) and np.isfinite(result["val_kl"])

    # --- sample: `mmvae sample --ema --mode reconstruct` -----------------
    out_png = tmp_path / "recon.png"
    argv = [
        "sample", "--config", "seq_vae", "--ckpt", str(ckpt_dir),
        "--ema", "--mode", "reconstruct", "--batch", "2",
        "--out", str(out_png),
    ]
    for o in ovs:
        argv += ["--set", o]
    assert cli.main(argv) == 0
    assert out_png.is_file() and out_png.stat().st_size > 0
