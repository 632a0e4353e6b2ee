"""Time the XLA prep (pad + y-shift stack + warp clip/concat) that precedes
the resample kernel, in isolation and by layout."""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

K = 2
N = 2 * K + 2
FILL = 1.0


def _sync(x):
    return float(jnp.sum(x[0] if isinstance(x, tuple) else x))


@functools.partial(jax.jit, static_argnames=("mode",))
def prep(field, warp, mode="full"):
    if mode in ("full", "stack"):
        padded = jnp.pad(field, ((K, K + 1), (K, K + 1), (0, 0)),
                         constant_values=FILL)
        stacked = jnp.stack(
            [padded[:, cy : cy + field.shape[1], :] for cy in range(N)]
        )
        if mode == "stack":
            return stacked
    if mode in ("full", "warp"):
        wc = jnp.concatenate(
            [jnp.clip(warp[..., :2], -K, K), warp[..., 2:]], axis=-1
        )
        if mode == "warp":
            return wc
    return stacked, wc


@jax.jit
def prep_transposed(field):
    # (x,y,z) -> (y,x,z) so the shift axis is LEADING: slices are contiguous.
    ft = jnp.transpose(field, (1, 0, 2))
    padded = jnp.pad(ft, ((K, K + 1), (K, K + 1), (0, 0)), constant_values=FILL)
    return jnp.stack([padded[cy : cy + field.shape[1], :, :] for cy in range(N)])


def timed(fn, *args, name=""):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:12s} {best*1e3:8.2f} ms")


def main():
    rng = np.random.default_rng(0)
    field = jnp.asarray(np.tanh(rng.standard_normal((128, 128, 128)) * 0.3)
                        .astype(np.float32))
    warp = jnp.asarray((rng.standard_normal((128, 128, 128, 3)) * 1.5)
                       .astype(np.float32))
    timed(lambda f: prep(f, warp, mode="stack"), field, name="stack(x,y,z)")
    timed(lambda w: prep(field, w, mode="warp"), warp, name="warp concat")
    timed(lambda f, w: prep(f, w, mode="full"), field, warp, name="full prep")
    timed(prep_transposed, field, name="stack(y,x,z)")


if __name__ == "__main__":
    main()
