"""Numpy-backed RandNumGen stand-in (reference ``tiberate/rng/simplerng``).

Same API/channel semantics as :class:`Csprng` but driven by numpy's
Philox-free default generator — NOT cryptographically secure; for tests and
for environments where determinism against the ChaCha20 stream is not
required.  Repeating channels use a separate, fixed-seeded generator so the
cross-shard shared-randomness guarantee still holds.
"""

import numpy as np

import jax.numpy as jnp

from tiberate_tpu.rng.interface import RandNumGen


class SimpleRNG(RandNumGen):
    def __init__(
        self,
        num_coefs=2**15,
        num_channels=None,
        num_repeating_channels=2,
        sigma=3.2,
        seed=None,
        nonce=None,
    ):
        self.num_coefs = num_coefs
        self.num_channels = [8] if num_channels is None else list(num_channels)
        self.shares = (
            self.num_channels
            if len(self.num_channels) == 1
            else [sum(self.num_channels)]
        )
        self.total_num_channels = sum(self.shares)
        self.num_repeating_channels = num_repeating_channels
        self.sigma = sigma
        self.refresh(seed, nonce)

    def refresh(self, seed=None, nonce=None):
        self._rng = np.random.default_rng(seed)
        # repeating channels: fixed stream derived from the same seed so
        # every shard reproduces it
        self._rep_rng = np.random.default_rng(
            seed if seed is None else seed + 1
        )

    def _gen(self, n_ch, repeats):
        return self._rng, self._rep_rng, n_ch, repeats

    def randbytes(self, shares=None, repeats=0, reshape=False):
        nch = self.total_num_channels if shares is None else shares
        rows = (nch + repeats) * (self.num_coefs // 4)
        words = self._rng.integers(0, 2**32, (rows, 16), dtype=np.uint32)
        if reshape:
            return jnp.asarray(words.reshape(-1, self.num_coefs // 4, 16))
        return jnp.asarray(words)

    def randint(self, amax=3, shift=0, repeats=0):
        if not isinstance(amax, (list, tuple, np.ndarray)):
            amax = [amax]
        out = []
        for i, q in enumerate(amax):
            gen = self._rep_rng if i >= len(amax) - repeats else self._rng
            out.append(
                gen.integers(0, int(q), self.num_coefs, dtype=np.int64)
                + int(shift)
            )
        return jnp.asarray(np.stack(out))

    def discrete_gaussian(self, non_repeats=0, repeats=1):
        out = []
        for i in range(non_repeats):
            out.append(
                np.rint(
                    self._rng.normal(0, self.sigma, self.num_coefs)
                ).astype(np.int64)
            )
        for i in range(repeats):
            out.append(
                np.rint(
                    self._rep_rng.normal(0, self.sigma, self.num_coefs)
                ).astype(np.int64)
            )
        return jnp.asarray(np.stack(out))

    def randround(self, coef):
        coef = np.asarray(coef, dtype=np.float64)
        sign = np.sign(coef)
        a = np.abs(coef)
        integ = np.floor(a)
        frac = a - integ
        rounded = self._rng.random(coef.shape) < frac
        return (sign * (integ + rounded)).astype(np.int64)
