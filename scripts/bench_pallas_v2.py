"""Prototype: VMEM-resident im2col Pallas 3x3 conv (K=9*Cin single matmul)
vs the current 9-tap accumulate kernel, at Berk-AE shapes."""
import sys, time, functools
sys.path.insert(0, ".")
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.ops import pallas_conv

def _round_up(n, m): return (n + m - 1) // m * m

def _kernel_v2(x_ref, k_ref, o_ref, *, th, w, taps_per_dot):
    # build patches in VMEM: concat tap windows along channels
    dn = (((2,), (0,)), ((), ()))
    acc = None
    idx = [(du, dv) for du in range(3) for dv in range(3)]
    for g in range(0, 9, taps_per_dot):
        grp = idx[g:g+taps_per_dot]
        xs = jnp.concatenate([x_ref[0, du:du+th, dv:dv+w, :] for du, dv in grp], axis=-1)
        kg = jnp.concatenate([k_ref[du*3+dv] for du, dv in grp], axis=0)
        y = jax.lax.dot_general(xs, kg, dn, preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y
    o_ref[:] = acc

@functools.partial(jax.jit, static_argnames=("th", "taps"))
def conv_v2(x, kernel, th=8, taps=9):
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    hp = _round_up(h, th)
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0,0),(1,1+hp-h),(1,1),(0,0)))
    kr = kernel.reshape(9, cin, cout).astype(jnp.bfloat16)
    grid = (b, hp // th)
    y = pl.pallas_call(
        functools.partial(_kernel_v2, th=th, w=w, taps_per_dot=taps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((pl.Element(1), pl.Element(th+2), pl.Element(w+2), pl.Element(cin)),
                         lambda bi, i: (bi, i*th, 0, 0)),
            pl.BlockSpec((9, cin, cout), lambda bi, i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, th, w, cout), lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, cout), jnp.float32),
    )(xp, kr)
    return y if hp == h else y[:, :h]

def slope_time(fn, x, k, n1=2, n2=12, rounds=3):
    @jax.jit
    def chain_step(x, k):
        y = fn(x, k)
        return x + y.mean() * 0.0, y
    def chain(n):
        xc = x; out = None
        for _ in range(n):
            xc, out = chain_step(xc, k)
        return float(out.mean())
    chain(2)
    samples = []
    for _ in range(rounds):
        t0 = time.perf_counter(); chain(n1); t1 = time.perf_counter()
        chain(n2); t2 = time.perf_counter()
        samples.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return min(samples)

SHAPES = [((8, 256, 384, 96), 192), ((8, 256, 384, 192), 96), ((8, 128, 192, 96), 192)]
for (shp, cout) in SHAPES:
    x = jax.random.uniform(jax.random.PRNGKey(0), shp, jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (3,3,shp[-1],cout), jnp.float32) * 0.05
    fl = 2*9*shp[-1]*cout*shp[0]*shp[1]*shp[2]
    # correctness first
    ref = pallas_conv.conv3x3_halo(x, k)
    for taps, th in ((9, 8), (3, 16), (3, 8)):
        try:
            got = conv_v2(x, k, th=th, taps=taps)
            err = float(jnp.max(jnp.abs(got - ref)))
            t = slope_time(lambda x, k: conv_v2(x, k, th=th, taps=taps), x, k)
            print(f"{shp}->{cout} taps={taps} th={th}: {t*1e3:7.2f} ms ({fl/t/1e12:5.1f} TF/s) maxerr {err:.2e}")
        except Exception as e:
            print(f"{shp}->{cout} taps={taps} th={th}: FAIL {type(e).__name__}: {str(e)[:120]}")
