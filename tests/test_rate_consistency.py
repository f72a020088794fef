"""Surrogate-rate vs real-bitstream consistency.

Guards the context-quantization subtlety: the ZTsep EVAL forward uses
``round(x)`` contexts (mirroring the reference's
``quantize(x, "dequantize")`` with no means, ``LiftingBasedDWT_net.py:341``)
while the CODING path feeds ``round(x - mu) + mu`` back (reference
``compress_ar`` writes ``y_q + mu`` into ``y_hat``, ``:494``). Round trips
stay bit-exact either way, but the eval-estimated rate could silently drift
from the real bpp. This test trains a small model briefly and asserts the
real bitstream lands within a few percent of the eval estimate.
"""

import jax
import jax.numpy as jnp
import numpy as np

from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.config import Config
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.models.codec import (
    CodecWrapper)
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.data import (
    ImageDataLoader, synthetic_images)
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.state import (
    init_state, make_eval_step, make_optimizer, make_train_step)


def _train_briefly(cfg, steps=60):
    model = CodecWrapper(cfg)
    rng = jax.random.PRNGKey(0)
    state = init_state(cfg, model,
                       jnp.zeros((cfg.batch_size, 32, 32, 3)), rng)
    tx = make_optimizer(cfg)
    step = make_train_step(cfg, model, tx)
    data = ImageDataLoader(cfg)
    lr = jnp.asarray(cfg.learning_rate)
    one = jnp.asarray(1.0)
    it = 0
    while it < steps:
        for batch in data.train_batches(10, seed=it):
            rng, srng = jax.random.split(rng)
            state, out, _ = step(state, jnp.asarray(batch), srng, lr, one)
            it += 1
            if it >= steps:
                break
    return model, state


def test_ztsep_real_bpp_matches_eval_estimate():
    from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.coding.codec_coder import (
        CodecCoder)

    cfg = Config(netType="CDF97", entropy_layer="conditioned2ZTsepSubbands",
                 autoencoder="SubbandAutoEncoder", clrch=1, dwtlevels=2,
                 patch_size=32, batch_size=4, lambda_=400.0,
                 learning_rate=1e-3, training_loss_switch=1)
    model, state = _train_briefly(cfg)

    img = synthetic_images(1, 64)[0][None] / 255.0  # (1, 64, 64, 3) in [0,1]
    eval_step = make_eval_step(cfg, model)
    out = eval_step(state.params, jnp.asarray(img, jnp.float32))
    est_bpp = float(out.rate1 + out.rate2)

    coder = CodecCoder(cfg, model, state.params)
    res = coder.compress_decompress(np.asarray(img, np.float32))
    real_bpp = res.bpp

    # real carries table-quantization + tail/escape overhead; the context
    # convention (round(x) eval vs round(x-mu)+mu coding) must not push it
    # further than a few percent from the estimate
    assert real_bpp == np.clip(real_bpp, 0.5 * est_bpp, 1.25 * est_bpp), (
        f"real {real_bpp:.4f} bpp vs estimate {est_bpp:.4f} bpp")
    assert abs(real_bpp - est_bpp) < max(0.15 * est_bpp, 0.25), (
        f"real {real_bpp:.4f} bpp vs estimate {est_bpp:.4f} bpp")
