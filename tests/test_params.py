"""Parameter layer: primes, security tables, config, partitions, contexts."""

import numpy as np
import pytest

from tiberate_tpu.config import CkksConfig, Preset, maximum_qbits
from tiberate_tpu.context.mont_context import MontgomeryContext
from tiberate_tpu.context.rns_partition import RnsPartition
from tiberate_tpu.utils.primes import (
    check_ntt_primality,
    find_the_next_prime,
    generate_message_primes_for,
    generate_alternating_prime_sequence,
    is_prime,
)


def test_is_prime_basics():
    primes = [2, 3, 5, 7, 97, 2**31 - 1, 1152921504606844513]
    comps = [1, 4, 9, 2**31, 2**61 - 3, 1152921504606844515]
    assert all(is_prime(p) for p in primes)
    assert not any(is_prime(c) for c in comps)


def test_message_primes_ntt_friendly():
    logN = 14
    primes = generate_message_primes_for(60, logN, how_many=5)
    M = 2 ** (logN + 1)
    assert len(primes) == 5
    assert primes == sorted(primes, reverse=True)
    for p in primes:
        assert p < 2**60
        assert (p - 1) % M == 0
        assert is_prime(p)


def test_find_next_prime_directions():
    m = 2**13
    up = find_the_next_prime(2**40 + 1, m, up=True)
    down = find_the_next_prime(2**40 - 1, m, up=False)
    assert down < 2**40 < up
    assert check_ntt_primality(up, m) and check_ntt_primality(down, m)


def test_scale_primes_alternate_and_cancel():
    primes = generate_alternating_prime_sequence(sb=40, N=2**14, how_many=16)
    assert len(set(primes)) == 16
    scale = float(2**40)
    # cumulative deviation should stay close to 1
    dev = 1.0
    for p in primes:
        dev *= scale / p
    assert abs(dev - 1) < 1e-4


def test_maximum_qbits_anchors():
    # Table anchor: post-quantum/uniform/128-bit at n=32768 -> 829.
    assert maximum_qbits(32768) == pytest.approx(829)
    # Interpolation is monotone between anchors.
    assert maximum_qbits(20000) < maximum_qbits(32768)
    # Extrapolation beyond the table keeps the last slope.
    assert maximum_qbits(65536) > maximum_qbits(32768)


@pytest.mark.parametrize("preset", [Preset.logN14, Preset.logN15])
def test_config_presets(preset):
    cfg = CkksConfig.parse(preset)
    assert cfg.N == 2**cfg.logN
    # prime layout: scales ascending positions, then base, then specials
    assert len(cfg.q) == cfg.num_scales + 1 + cfg.num_special_primes
    for i, q in enumerate(cfg.q):
        assert (q - 1) % (2 * cfg.N) == 0
    # scale primes ~2^40, base/special ~2^60
    for q in cfg.q[: cfg.num_scales]:
        assert abs(np.log2(q) - 40) < 1
    for q in cfg.q[cfg.num_scales :]:
        assert 59 < np.log2(q) < 60
    # security check passed during construction
    total_bits = sum(np.log2(q) for q in cfg.q)
    assert total_bits <= cfg.max_qbits + 1


def test_mont_context():
    cfg = CkksConfig.parse(Preset.logN14)
    ctx = MontgomeryContext.from_ckks_config(cfg)
    assert ctx.R == 2**62
    for q, Rs, Rinv, k in zip(ctx.q, ctx.R_square, ctx.R_inv, ctx.k):
        assert Rs == ctx.R**2 % q
        assert Rinv * ctx.R % q == 1
        assert k == (ctx.R * Rinv - 1) // q
        assert 4 * q < ctx.R


def test_rns_partition_single_device():
    part = RnsPartition(num_ordinary_primes=17, num_special_primes=2,
                        num_devices=1)
    assert part.num_partitions == 8
    # All primes flat on device 0, ascending.
    assert part.flat_prime_allocations[0] == list(range(19))
    # Level views drop from the front.
    assert part.destination_arrays_with_special[3][0] == list(range(3, 19))
    assert part.destination_arrays[3][0] == list(range(3, 17))
    assert part.rescaler_loc == [0] * 17
    # Parts at level 0: 8 scale parts + base part (+ special in p_special).
    assert len(part.p[0][0]) == 9
    assert part.p[0][0][0] == [0, 1]
    assert part.p_special[0][0][-1] == [17, 18]
    # At level 1 the first part is partial.
    assert part.p[1][0][0] == [1]
    assert part.p[1][0][1] == [2, 3]
    # At level 2 the first partition is gone.
    assert len(part.p[2][0]) == 8
    assert part.p[2][0][0] == [2, 3]


def test_rns_partition_multi_device():
    part = RnsPartition(num_ordinary_primes=17, num_special_primes=2,
                        num_devices=2)
    # Parts round-robined: dev0 gets odd parts + base + special.
    assert part.part_allocations[0][-2:] == [8, 9]
    # Every ordinary prime appears exactly once across devices.
    all_primes = sorted(
        sum((part.flat_prime_allocations[d] for d in range(2)), [])
    )
    # specials (17, 18) appear on both devices
    assert all_primes.count(17) == 2 and all_primes.count(18) == 2
    ordinary = [p for p in all_primes if p < 17]
    assert ordinary == list(range(17))
