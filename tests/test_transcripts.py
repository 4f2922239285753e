"""Transcript/RNG tests.

Mirrors reference test coverage (fri/src/fiat_shamir/transcript.rs:142-247,
plonk/src/challenge.rs:109-148, nova/src/transcript.rs:134-214): determinism,
distinctness, must-feed-before-draw guards; plus a cross-validation of the
ChaCha core against the `cryptography` package (OpenSSL) keystream.
"""
import pytest

from zktpu.fields import host
from zktpu.transcript.chacha import ChaChaRng, StdRng, chacha_block, seed_from_u64
from zktpu.transcript.ark_rand import fp_rand
from zktpu.transcript.serialize import g1_uncompressed, fr_bytes
from zktpu.transcript.transcripts import (
    FriTranscript,
    NovaTranscript,
    PlonkChallengeGenerator,
    TranscriptError,
)


def test_chacha20_block_matches_openssl():
    # cryptography's ChaCha20 uses the DJB variant: 16-byte IV = 8-byte LE
    # counter || 8-byte nonce — the same layout as rand_chacha.
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms

    key = bytes(range(32))
    for counter, stream in [(0, 0), (1, 0), (0, 0x1122334455667788), (7, 42)]:
        nonce = counter.to_bytes(8, "little") + stream.to_bytes(8, "little")
        enc = Cipher(algorithms.ChaCha20(key, nonce), mode=None).encryptor()
        expect = enc.update(bytes(64))
        key_words = [int.from_bytes(key[4 * i : 4 * i + 4], "little") for i in range(8)]
        stream_words = [stream & 0xFFFFFFFF, stream >> 32]
        words = chacha_block(key_words, counter, stream_words, rounds=20)
        got = b"".join(w.to_bytes(4, "little") for w in words)
        assert got == expect, (counter, stream)


def test_chacha_rng_stream_continuity():
    rng1 = ChaChaRng(bytes(range(32)), rounds=12)
    rng2 = ChaChaRng(bytes(range(32)), rounds=12)
    a = [rng1.next_u32() for _ in range(40)]
    b = []
    while len(b) < 40:
        v = rng2.next_u64()
        b += [v & 0xFFFFFFFF, v >> 32]
    assert a == b[:40]


def test_seed_from_u64_deterministic_and_sensitive():
    s0 = seed_from_u64(0)
    s1 = seed_from_u64(1)
    assert len(s0) == 32 and s0 != s1
    assert seed_from_u64(0) == s0


@pytest.mark.parametrize("spec", [host.FR, host.GOLDILOCKS], ids=lambda s: s.name)
def test_fp_rand_range_and_determinism(spec):
    rng = StdRng.from_seed_u64(12345)
    vals = [fp_rand(spec, rng) for _ in range(20)]
    assert all(0 <= v < spec.modulus for v in vals)
    rng2 = StdRng.from_seed_u64(12345)
    assert [fp_rand(spec, rng2) for _ in range(20)] == vals
    assert len(set(vals)) == len(vals)


def test_fri_transcript_reference_semantics():
    # deterministic (transcript.rs:169-180)
    t1 = FriTranscript(host.GOLDILOCKS, 0)
    t2 = FriTranscript(host.GOLDILOCKS, 0)
    t1.digest(928459)
    t2.digest(928459)
    assert t1.generate_a_challenge() == t2.generate_a_challenge()

    # different after re-digesting the same value (index counter advances)
    t1.digest(928459)
    c2 = t1.generate_a_challenge()
    t3 = FriTranscript(host.GOLDILOCKS, 0)
    t3.digest(928459)
    assert c2 != t3.generate_a_challenge()

    # challenge list determinism + distinct elements (transcript.rs:183-213)
    t4 = FriTranscript(host.GOLDILOCKS, 0)
    t4.digest(31313213)
    g = t4.generate_challenges(5)
    assert len(set(g)) == 5
    t5 = FriTranscript(host.GOLDILOCKS, 0)
    t5.digest(31313213)
    assert t5.generate_challenges(5) == g
    # usize form: low 64 bits of canonical value
    t6 = FriTranscript(host.GOLDILOCKS, 0)
    t6.digest(31313213)
    assert t6.generate_challenge_list_usize(5) == [v % 2**64 for v in g]

    # safe guard (transcript.rs:216-224)
    with pytest.raises(TranscriptError):
        t6.generate_challenges(5)


class _FakePoint:
    def __init__(self, x, y, infinity=False):
        self.x, self.y, self.infinity = x, y, infinity


def test_plonk_challenge_generator_semantics():
    p1 = _FakePoint(host.G1_GEN_X, host.G1_GEN_Y)
    p2 = _FakePoint(host.G1_GEN_X, (host.FQ_MODULUS - host.G1_GEN_Y) % host.FQ_MODULUS)
    a = PlonkChallengeGenerator.from_commitments([p1, p2]).generate_challenges(3)
    b = PlonkChallengeGenerator.from_commitments([p2]).generate_challenges(1)
    c = PlonkChallengeGenerator.from_commitments([p1, p2]).generate_challenges(3)
    assert a == c
    assert a[0] != b[0]
    gen = PlonkChallengeGenerator.from_commitments([p1])
    gen.generate_challenges(3)
    with pytest.raises(TranscriptError):
        gen.generate_challenges(3)


def test_nova_transcript_scalar_and_point_feeds():
    p1 = _FakePoint(host.G1_GEN_X, host.G1_GEN_Y)
    t1 = NovaTranscript()
    t2 = NovaTranscript()
    for t in (t1, t2):
        t.feed_scalar_num(15)
        t.feed_scalar_num(20)
        t.feed(p1)
    assert t1.generate_challenges(3) == t2.generate_challenges(3)
    t3 = NovaTranscript.from_scalar_number([15, 20])
    t4 = NovaTranscript.from_scalar_number([15, 20])
    assert t3.generate_challenges(3) == t4.generate_challenges(3)


def test_serialize_shapes():
    assert len(fr_bytes(1)) == 32
    b = g1_uncompressed(host.G1_GEN_X, host.G1_GEN_Y, False)
    assert len(b) == 96
    # infinity: all-zero except bit 6 of last byte
    binf = g1_uncompressed(0, 0, True)
    assert binf[:-1] == bytes(95) and binf[-1] == 0x40
    # y-sign flag: negated generator y is "negative" iff 2y > p
    y = host.G1_GEN_Y
    yneg = host.FQ_MODULUS - y
    flag_pos = g1_uncompressed(host.G1_GEN_X, y, False)[-1] >> 7
    flag_neg = g1_uncompressed(host.G1_GEN_X, yneg, False)[-1] >> 7
    assert {flag_pos, flag_neg} == {0, 1}
