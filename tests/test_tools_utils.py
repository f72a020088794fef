"""Tools + utils: RD plot/BD-rate, montage, patcher, plots, timers."""

import os

import numpy as np


def test_bd_rate_sane():
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.tools.rd_plot import (
        bd_rate, load_anchors)
    a = load_anchors()
    assert "jpeg2000" in a and "proposed_method" in a
    # a curve against itself is ~0
    bd = bd_rate(a["jpeg2000"]["bpp"], a["jpeg2000"]["psnr"],
                 a["jpeg2000"]["bpp"], a["jpeg2000"]["psnr"])
    assert abs(bd) < 1e-6
    # the proposed method beats JPEG2000 (negative BD-rate)
    bd = bd_rate(a["jpeg2000"]["bpp"], a["jpeg2000"]["psnr"],
                 a["proposed_method"]["bpp"], a["proposed_method"]["psnr"])
    assert bd < -10


def test_rd_plot_writes_png(tmp_path):
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.tools.rd_plot import (
        plot_rd)
    out = plot_rd({"mine": {"bpp": [0.2, 0.5, 1.0],
                            "psnr": [28.0, 31.0, 35.0]}},
                  out_path=str(tmp_path / "rd.png"))
    assert os.path.getsize(out) > 1000


def test_montage(tmp_path):
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.tools.figure_montage import (
        montage)
    imgs = [np.random.rand(32, 32, 3) for _ in range(4)]
    out = montage(imgs, ["a", "b", "c", "d"],
                  out_path=str(tmp_path / "m.png"))
    assert os.path.exists(out)


def test_make_patches(tmp_path):
    from PIL import Image
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.tools.make_patches import (
        save_patches_from_imgs)
    src = tmp_path / "src"
    src.mkdir()
    Image.fromarray((np.random.rand(80, 90, 3) * 255).astype(np.uint8)).save(
        src / "x.png")
    n = save_patches_from_imgs(str(src), str(tmp_path / "dst"),
                               patches_per_image=3, patch=64)
    assert n == 3
    assert len(os.listdir(tmp_path / "dst")) == 3


def test_wavelet_pyramid_montage(tmp_path):
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.utils.image_plots import (
        wavelet_pyramid)
    xe = np.random.rand(1, 8, 8, 1)
    xo = [np.random.rand(1, 16, 16, 3), np.random.rand(1, 8, 8, 3)]
    canvas = wavelet_pyramid(xe, xo, out_path=str(tmp_path / "pyr.png"))
    assert canvas.shape == (32, 32)
    assert os.path.exists(tmp_path / "pyr.png")


def test_phase_timers():
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.utils.profiling import (
        PhaseTimers)
    t = PhaseTimers()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    assert t.counts["a"] == 2
    assert "a:" in t.report()


def test_mailer_unconfigured_is_noop():
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.utils.mailer import (
        Mailer)
    assert Mailer().send("s", "b") is False
