"""Config system + CLI sweep driver."""

import json
import os

import pytest

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu import config as cfg_mod


def _write_cfg(tmp_path, **overrides):
    raw = {
        "exp_name": "t", "agent": "LiftingBasedDWTAgent", "mode": "train",
        "clrch": 3, "netType": "CDF97", "entropy_layer": "factorized",
        "autoencoderFlag": "SubbandAutoEncoder",  # alias key on purpose
        "dwtlevels": 2, "batch_size": 2, "patch_size": 32,
        "lambda_": 100.0, "max_epoch": 1, "steps_per_epoch": 2,
        "loss_prnt_iters": 2, "cuda": True, "gpu_device": 0,  # ignored keys
    }
    raw.update(overrides)
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(raw))
    return str(p)


def test_config_aliases_and_ignored_keys(tmp_path):
    cfg = cfg_mod.get_config_from_json(_write_cfg(tmp_path))
    assert cfg.autoencoder == "SubbandAutoEncoder"
    assert not hasattr(cfg, "gpu_device")


def test_config_validation_errors(tmp_path):
    with pytest.raises(ValueError):
        cfg_mod.get_config_from_json(_write_cfg(tmp_path, netType="bogus"))
    with pytest.raises(ValueError):
        cfg_mod.get_config_from_json(_write_cfg(tmp_path, clrch=2))


def test_process_config_creates_dirs(tmp_path):
    path = _write_cfg(tmp_path)
    cfg = cfg_mod.process_config(path, experiments_root=str(tmp_path / "e"))
    for d in (cfg.summary_dir, cfg.checkpoint_dir, cfg.out_dir, cfg.log_dir):
        assert os.path.isdir(d)


def test_expand_sweep(tmp_path):
    path = _write_cfg(tmp_path, multi_agent=True, multi_param="lambda_",
                      lambda_=[10.0, 20.0], multi_exp_name="sweep")
    cfg = cfg_mod.process_config(path, experiments_root=str(tmp_path / "e"))
    subs = cfg_mod.expand_sweep(cfg, experiments_root=str(tmp_path / "e"))
    assert len(subs) == 2
    assert subs[0].lambda_ == 10.0 and subs[1].lambda_ == 20.0
    assert subs[0].exp_name == os.path.join("sweep", "exp_10.0")


def test_cli_sweep_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.cli import main
    path = _write_cfg(tmp_path, multi_agent=True, multi_param="lambda_",
                      lambda_=[50.0, 500.0], multi_exp_name="sweep2",
                      validate_every=1)
    assert main([path]) == 0
    results = json.load(open(
        tmp_path / "experiments" / "sweep2" / "results.json"))
    assert len(results) == 2
    for entry in results.values():
        assert entry["best_valid_loss"] is not None


def test_cli_supervise_flag_wraps_run(tmp_path, monkeypatch):
    """--supervise re-execs the CLI under the liveness supervisor with
    resume forced on; --stall-timeout is forwarded."""
    import sys

    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu import cli
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train import (
        supervisor)

    captured = {}

    def fake_supervise(cmd, timeout):
        captured["cmd"] = cmd
        captured["timeout"] = timeout
        return 0

    monkeypatch.setattr(supervisor, "supervise", fake_supervise)
    path = _write_cfg(tmp_path)
    assert cli.main(["--supervise", "--stall-timeout", "120", path]) == 0
    assert captured["timeout"] == 120.0
    assert captured["cmd"][0] == sys.executable
    assert captured["cmd"][1:3] == ["-m", cli.__name__]
    assert "--resume-training" in captured["cmd"]
    assert path in captured["cmd"]
    assert "--supervise" not in captured["cmd"]


def test_cli_resume_training_override(tmp_path, monkeypatch):
    """--resume-training forces cfg.resume_training for every sub-run."""
    monkeypatch.chdir(tmp_path)
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu import cli

    seen = []

    def fake_run_agent(cfg):
        seen.append(cfg.resume_training)

        class A:
            best_valid_loss = 0.0

        return A()

    monkeypatch.setattr(cli, "run_agent", fake_run_agent)
    path = _write_cfg(tmp_path)
    assert cli.main(["--resume-training", path]) == 0
    assert seen == [True]


def test_graft_entry_import_is_backend_free():
    """Importing the driver entry module must not initialize any jax
    backend: with the accelerator transport down, a module-level device
    array would hang every import — including the CPU-only multichip
    dryrun. (Regression: ops/color.py YCBCR_SHIFT.)"""
    import subprocess
    import sys

    code = (
        "import __graft_entry__\n"
        "from jax._src import xla_bridge\n"
        "assert not xla_bridge._backends, 'backend initialized at import'\n"
        "print('ok')\n")
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr
    assert "ok" in out.stdout
