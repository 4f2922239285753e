"""Golden byte-level vectors for the bit-exactness chain.

The reference derives every Fiat-Shamir challenge through a fixed pipeline:

    SHA-256 chain -> seed = LE u64 of digest[0..8]
      -> StdRng::seed_from_u64 (PCG32 expansion, rand_core 0.6)
      -> ChaCha12 keystream (rand 0.8 StdRng)
      -> arkworks Fp::rand (mask / reject / Montgomery interpretation)

plus arkworks `serialize_uncompressed` for the transcript feed encodings
(fri/src/fiat_shamir/transcript.rs:80-99, plonk/src/challenge.rs:49-71,
nova/src/transcript.rs:69-99).  A one-bit slip anywhere diverges every
downstream challenge, so each stage is pinned here at the byte level.

Two classes of constants:

* EXTERNAL anchors — independently published values (the zcash/IETF
  BLS12-381 generator encodings; OpenSSL's ChaCha20 keystream via the
  `cryptography` package) that validate our conventions against the world.
* FROZEN pins — byte-exact snapshots of this implementation, each annotated
  with the Rust snippet that reproduces it against the reference crates
  (no Rust toolchain exists in this environment; the snippets make the
  pins one `cargo run` away from external verification).  Any future
  regression in ChaCha12 / seed expansion / fp_rand / flag bits fails here.

Where possible a stage is ALSO re-derived in-test by an independent
implementation (different code structure) so a pin can't silently co-vary
with the library code.
"""
import hashlib

import numpy as np
import pytest

from zktpu.fields.host import FR, FQ, GOLDILOCKS
from zktpu.transcript.chacha import ChaChaRng, StdRng, chacha_block, seed_from_u64
from zktpu.transcript.ark_rand import fp_rand
from zktpu.transcript.serialize import fr_bytes, g1_uncompressed, g2_uncompressed
from zktpu.transcript.transcripts import (
    FriTranscript,
    NovaTranscript,
    PlonkChallengeGenerator,
)
from zktpu.curves.host_curve import G1Affine, G2Affine


# ---------------------------------------------------------------------------
# 1. Curve-point serialization — EXTERNAL anchors
# ---------------------------------------------------------------------------

# The IETF pairing-friendly-curves / zcash compressed encodings of the
# BLS12-381 generators are published constants (big-endian x with 3 flag
# bits in the top byte).  They externally validate (a) our generator
# coordinates and (b) the little-endian byte order of the arkworks encoding.
ZCASH_G1_GEN_COMPRESSED = bytes.fromhex(
    "97f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905"
    "a14e3a3f171bac586c55e83ff97a1aeffb3af00adb22c6bb"
)
ZCASH_G2_GEN_COMPRESSED = bytes.fromhex(
    "93e02b6052719f607dacd3a088274f65596bd0d09920b61a"
    "b5da61bbdc7f5049334cf11213945d57e5ac7d055d042b7e"
    "024aa2b2f08f0a91260805272dc51051c6e47ad4fa403b02"
    "b4510b647ae3d1770bac0326a805bbefd48056c8c121bdb8"
)


def test_g1_generator_x_matches_zcash_spec():
    be_x = bytearray(ZCASH_G1_GEN_COMPRESSED)
    be_x[0] &= 0x1F  # strip compression/infinity/sign flags
    assert int.from_bytes(bytes(be_x), "big") == G1Affine.generator().x
    # arkworks-uncompressed x half is the little-endian mirror
    enc = g1_uncompressed(G1Affine.generator().x, G1Affine.generator().y, False)
    assert enc[:48] == bytes(reversed(be_x))


def test_g2_generator_x_matches_zcash_spec():
    # zcash G2 x = c1 (48B BE, flagged) || c0 (48B BE)
    be = bytearray(ZCASH_G2_GEN_COMPRESSED)
    be[0] &= 0x1F
    c1 = int.from_bytes(bytes(be[:48]), "big")
    c0 = int.from_bytes(bytes(be[48:96]), "big")
    g2 = G2Affine.generator()
    assert (g2.x.c0, g2.x.c1) == (c0, c1)
    # arkworks-uncompressed leads with c0 little-endian
    enc = g2_uncompressed(g2.x.c0, g2.x.c1, g2.y.c0, g2.y.c1, False)
    assert enc[:48] == c0.to_bytes(48, "little")
    assert enc[48:96] == c1.to_bytes(48, "little")


# FROZEN pins of the full arkworks `serialize_uncompressed` outputs.
# Reproduce: `G1Affine::generator().serialize_uncompressed(&mut v)` with
# ark-bls12-381 0.4 / ark-serialize 0.4 (same call the reference makes in
# plonk/src/challenge.rs:52-55).
G1_GEN_UNCOMPRESSED_HEX = (
    "bbc622db0af03afbef1a7af93fe8556c58ac1b173f3a4ea105b974974f8c68c3"
    "0faca94f8c63952694d79731a7d3f117e1e7c5462923aa0ce48a88a244c73cd0"
    "edb3042ccb18db00f60ad0d595e0f5fce48a1d74ed309ea0f1a0aae381f4b308"
)
G1_NEG_GEN_UNCOMPRESSED_HEX = (
    "bbc622db0af03afbef1a7af93fe8556c58ac1b173f3a4ea105b974974f8c68c3"
    "0faca94f8c63952694d79731a7d3f117cac239b9d6dc54ad1b75cb0eba386f4e"
    "3642accad5b95566c907b51def6a8167f2212ecfc8767daaa845d555681d4d91"
)
G1_INFINITY_UNCOMPRESSED_HEX = "00" * 95 + "40"
G1_2G_UNCOMPRESSED_HEX = (
    "4e0fbf29558c9ac3427c1c8fbb758fe22aa658c30a2d90432501289130db2197"
    "0c45a950ebc8088846674d90eacb7205289d7479198886ba1bbd16cdd4d9564c"
    "6ad75f1d02b93bf761e47086cb3eba22388e9d7773a6fd22a373c6ab8c9d6a96"
)


def test_g1_uncompressed_frozen_vectors():
    g = G1Affine.generator()
    assert g1_uncompressed(g.x, g.y, False).hex() == G1_GEN_UNCOMPRESSED_HEX
    assert (
        g1_uncompressed(g.x, FQ.modulus - g.y, False).hex()
        == G1_NEG_GEN_UNCOMPRESSED_HEX
    )
    assert g1_uncompressed(0, 0, True).hex() == G1_INFINITY_UNCOMPRESSED_HEX
    g2pt = g + g
    assert g1_uncompressed(g2pt.x, g2pt.y, False).hex() == G1_2G_UNCOMPRESSED_HEX
    # flag-bit placement: infinity = bit 6 of the LAST byte; y-sign = bit 7
    assert g1_uncompressed(0, 0, True)[95] == 0x40
    enc_neg = g1_uncompressed(g.x, FQ.modulus - g.y, False)
    enc_pos = g1_uncompressed(g.x, g.y, False)
    assert (enc_neg[95] ^ enc_pos[95]) & 0x80  # exactly one has the sign bit


def test_fr_bytes_layout():
    # arkworks Fp serialize_uncompressed: 32-byte little-endian, no flags
    assert fr_bytes(5).hex() == "05" + "00" * 31
    assert fr_bytes(FR.modulus - 1) == ((FR.modulus - 1).to_bytes(32, "little"))
    assert fr_bytes(FR.modulus) == b"\x00" * 32  # reduced mod r


# ---------------------------------------------------------------------------
# 2. seed_from_u64 — independent PCG32 re-derivation + frozen pins
# ---------------------------------------------------------------------------


def _pcg32_expand_independent(state: int) -> bytes:
    """rand_core 0.6 SeedableRng::seed_from_u64, re-implemented via numpy
    u64 arithmetic (structurally unlike transcript/chacha.py's int version)."""
    mul = np.uint64(6364136223846793005)
    inc = np.uint64(11634580027462260723)
    s = np.uint64(state)
    out = bytearray()
    with np.errstate(over="ignore"):
        for _ in range(8):
            s = s * mul + inc
            xs = np.uint32(((s >> np.uint64(18)) ^ s) >> np.uint64(27))
            rot = int(s >> np.uint64(59))
            x = np.uint32(
                (int(xs) >> rot | (int(xs) << ((32 - rot) & 31))) & 0xFFFFFFFF
            )
            out += int(x).to_bytes(4, "little")
    return bytes(out)


# Reproduce: `<StdRng as SeedableRng>::seed_from_u64(N)` then inspect the
# seed rand_core built (or: `ChaCha12Rng::seed_from_u64(N).get_seed()`).
SEED_EXPANSION_PINS = {
    0: "ecf273f981b5cd4587f0467306ad6cadd0d0a3e33317e767f29bea72d78a7dfe",
    1: "ead81d725d26104e899c3bf842ce782ebad303da9997d2c2120256ac7366fb1b",
    42: "a48fa17b58323d0aeab8a1cc690114b82b8cc87518b4f7548d446ea1e4df20f2",
    0xDEADBEEF: "2da11cc6304378008334e6ba587f94db281f8e3ea27b96f1722042d2e4410782",
}


def test_seed_from_u64_pins_and_independent():
    for seed, hexpin in SEED_EXPANSION_PINS.items():
        got = seed_from_u64(seed)
        assert got.hex() == hexpin
        assert got == _pcg32_expand_independent(seed)


# ---------------------------------------------------------------------------
# 3. ChaCha core — independent matrix re-derivation + OpenSSL (20 rounds)
#    + frozen ChaCha12 keystream pins
# ---------------------------------------------------------------------------


def _chacha_block_independent(key: bytes, counter: int, rounds: int) -> list[int]:
    """ChaCha block via a 4x4 numpy state matrix with explicit column and
    diagonal rounds — a different formulation than chacha.py's flat-list
    quarter rounds."""
    sigma = [0x61707865, 0x3320646E, 0x79622D32, 0x6B206574]
    kw = [int.from_bytes(key[4 * i : 4 * i + 4], "little") for i in range(8)]
    st = np.array(
        sigma + kw + [counter & 0xFFFFFFFF, (counter >> 32) & 0xFFFFFFFF, 0, 0],
        dtype=np.uint32,
    ).reshape(4, 4)
    w = st.copy()

    def qr(m, cols):
        def rotl(v, c):
            return (v << np.uint32(c)) | (v >> np.uint32(32 - c))

        a, b, c, d = (m[i, cols] for i in range(4))
        with np.errstate(over="ignore"):
            a = a + b
            d = rotl(d ^ a, 16)
            c = c + d
            b = rotl(b ^ c, 12)
            a = a + b
            d = rotl(d ^ a, 8)
            c = c + d
            b = rotl(b ^ c, 7)
        for i, row in enumerate((a, b, c, d)):
            m[i, cols] = row

    for _ in range(rounds // 2):
        qr(w, np.arange(4))  # column round (all 4 columns vectorized)
        # diagonal round: rotate rows left by their index, quarter-round
        # columns, rotate back
        for r in range(1, 4):
            w[r] = np.roll(w[r], -r)
        qr(w, np.arange(4))
        for r in range(1, 4):
            w[r] = np.roll(w[r], r)
    with np.errstate(over="ignore"):
        out = w + st
    return [int(v) for v in out.reshape(-1)]


# Reproduce: `ChaCha12Rng::from_seed([0u8;32])` / `from_seed([0,1,...,31])`
# then `next_u32()` 16 times (rand_chacha 0.3, the StdRng backend of the
# rand 0.8 used by the reference's transcripts).
CHACHA12_ZERO_KEY_BLOCK0 = [
    0x6A9AF49B, 0x53F95507, 0x12CE1F81, 0xD583265F,
    0xBBC32904, 0x1474E049, 0xA589007E, 0x5F15AE2E,
    0x79F86405, 0xC0E37AD2, 0x3428E82C, 0x798CFAAC,
    0x2C9F623A, 0x1969DEA0, 0x2FE80B61, 0xBE261341,
]
CHACHA12_SEQ_KEY_BLOCK0 = [
    0xFFF931F2, 0x5EC67AD1, 0x25F30544, 0xAA40E9D7,
    0x1F601349, 0xBC46BEC2, 0xC3CAC3E9, 0x361A1AD9,
    0x08B34059, 0x9F7C85C2, 0x54E2D629, 0x9AD42885,
    0x0A1B2B61, 0x165D76E6, 0xFBAE85E5, 0x79883646,
]


def test_chacha12_keystream_pins_and_independent():
    for key, pin in (
        (bytes(32), CHACHA12_ZERO_KEY_BLOCK0),
        (bytes(range(32)), CHACHA12_SEQ_KEY_BLOCK0),
    ):
        assert chacha_block(
            [int.from_bytes(key[4 * i : 4 * i + 4], "little") for i in range(8)],
            0,
            [0, 0],
            12,
        ) == pin
        assert _chacha_block_independent(key, 0, 12) == pin
        rng = ChaChaRng(key, rounds=12)
        assert [rng.next_u32() for _ in range(16)] == pin


def test_chacha20_matches_openssl_through_same_code_path():
    """EXTERNAL: the 20-round variant of the same chacha_block function must
    equal OpenSSL's keystream — validating state layout, quarter-round and
    counter placement; 12 vs 20 is then only the loop count."""
    cryptography = pytest.importorskip("cryptography")
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms

    key = bytes(range(32))
    for counter in (0, 1, 7):
        nonce = counter.to_bytes(8, "little") + bytes(8)
        ks = (
            Cipher(algorithms.ChaCha20(key, nonce), mode=None)
            .encryptor()
            .update(bytes(64))
        )
        words = [int.from_bytes(ks[4 * i : 4 * i + 4], "little") for i in range(16)]
        got = chacha_block(
            [int.from_bytes(key[4 * i : 4 * i + 4], "little") for i in range(8)],
            counter,
            [0, 0],
            20,
        )
        assert got == words


# Reproduce: `StdRng::seed_from_u64(0)` then `next_u64()` x4 (rand 0.8).
STDRNG_SEED0_U64 = [
    0xBB2A3FB2CD2C6F7F,
    0xC6017C948E27697B,
    0x069DC102CF310A16,
    0x958B761DABE5F6D0,
]


def test_stdrng_seed0_u64_pins():
    rng = StdRng.from_seed_u64(0)
    assert [rng.next_u64() for _ in range(4)] == STDRNG_SEED0_U64


# ---------------------------------------------------------------------------
# 4. arkworks Fp::rand — frozen pins + independent mask/reject re-derivation
# ---------------------------------------------------------------------------

# Reproduce: `Fr::rand(&mut StdRng::seed_from_u64(N))` with ark-bls12-381
# 0.4 (the exact call of plonk/src/challenge.rs:82-89); Goldilocks per the
# reference's MontConfig (fri/src/fields/goldilocks.rs:4-8).
FP_RAND_FR_PINS = {
    0: [
        0x699201275C7B728A133A3CD9135F218AA951A2274432C9381FEDD8A6ED7E497A % FR.modulus,
        0x0CE1E0B9A86A747D521C2D355235EF4D52D3E4D1EB1650E43B04AADC0DF8729C,
        0x271EC716F37A0E2D0DB0055F43164167F6B4F901FF80EB1824B3F14EBF3C11A0,
    ],
    1: [
        0x28591B74BDC65FDE33CDC1DB81019B265F0582D01A56B63667E396449F594A42,
        0x698B1A4FB59266AF87E85C116C6DD7830A7A42FA33EA7898F394E6CB33103198,
        0x1737588008580AC504268C0A6E8540E46AA77195C7950F0BE7CF5F457EF518CA,
    ],
    7: [
        0x0BBA72F395FD164EAAB326CEA053FD59B27AD080603AE0CF2275D4065766854B,
        0x1B02C7C1A510D95581F3288F021EC651F480E7FC95A6F9474F16F6D8A4E1AA5B,
        0x1D2D2076C51B7268C4AB59C743A1143CF4C15886CF2EAFD15B8905A3919065E0,
    ],
}
FP_RAND_GOLDILOCKS_PINS = {
    0: [8622511806116151220, 12382394218088332438, 3040269390304887043],
    1: [3704154867416701542, 9438917614978257191, 6928634968798118235],
}


def _fp_rand_independent(modulus: int, num_bits: int, rng: StdRng) -> int:
    """Independent re-derivation of arkworks Fp::rand: draw 64-bit limbs LE,
    shave excess top bits, reject >= p, interpret as Montgomery form."""
    n = (num_bits + 63) // 64
    r_inv = pow(1 << (64 * n), -1, modulus)
    while True:
        raw = b"".join(rng.next_u64().to_bytes(8, "little") for _ in range(n))
        v = int.from_bytes(raw, "little")
        v &= (1 << num_bits) - 1  # shave 64n - num_bits top bits
        if v < modulus:
            return v * r_inv % modulus


@pytest.mark.parametrize("seed", sorted(FP_RAND_FR_PINS))
def test_fp_rand_fr_pins(seed):
    rng = StdRng.from_seed_u64(seed)
    assert [fp_rand(FR, rng) for _ in range(3)] == FP_RAND_FR_PINS[seed]
    rng2 = StdRng.from_seed_u64(seed)
    assert [
        _fp_rand_independent(FR.modulus, FR.num_bits, rng2) for _ in range(3)
    ] == FP_RAND_FR_PINS[seed]


@pytest.mark.parametrize("seed", sorted(FP_RAND_GOLDILOCKS_PINS))
def test_fp_rand_goldilocks_pins(seed):
    rng = StdRng.from_seed_u64(seed)
    assert [fp_rand(GOLDILOCKS, rng) for _ in range(3)] == FP_RAND_GOLDILOCKS_PINS[
        seed
    ]
    rng2 = StdRng.from_seed_u64(seed)
    assert [
        _fp_rand_independent(GOLDILOCKS.modulus, GOLDILOCKS.num_bits, rng2)
        for _ in range(3)
    ] == FP_RAND_GOLDILOCKS_PINS[seed]


# ---------------------------------------------------------------------------
# 5. Full transcript replays — frozen pins of the end-to-end chain
# ---------------------------------------------------------------------------

# Reproduce (PLONK): feed G, 2G, 3G into plonk::challenge::ChallengeGenerator
# ::<Sha256>::from_commitments and draw [beta, gamma], feed G, draw alpha
# (plonk/src/challenge.rs:40-90).
PLONK_BETA_PIN = 0x3D4D7FED162FDBA8D6024643907B51671882D2D320C881768353388EA7ECE513
PLONK_GAMMA_PIN = 0x70D2D0DCF7E629ECE3FC8FE850CF75B02F7F3E70F6B579C6BBB1505488B7600A
PLONK_ALPHA_PIN = 0x186756F56E1A0AB61902EC799E9C2AE05A80D1AAA2E5A0454C12FE9B8D11E3BE


def test_plonk_transcript_replay_pin():
    g = G1Affine.generator()
    g2pt = g + g
    cg = PlonkChallengeGenerator.from_commitments([g, g2pt, g2pt + g])
    beta, gamma = cg.generate_challenges(2)
    assert (beta, gamma) == (PLONK_BETA_PIN, PLONK_GAMMA_PIN)
    cg.feed(g)
    assert cg.generate_challenges(1)[0] == PLONK_ALPHA_PIN
    # independent digest-chain re-derivation of the seed for beta/gamma
    d = hashlib.sha256(
        bytes.fromhex(G1_GEN_UNCOMPRESSED_HEX)
    ).digest()
    d = hashlib.sha256(d + bytes.fromhex(G1_2G_UNCOMPRESSED_HEX)).digest()
    g3 = g2pt + g
    d = hashlib.sha256(d + g1_uncompressed(g3.x, g3.y, False)).digest()
    rng = StdRng.from_seed_u64(int.from_bytes(d[:8], "little"))
    assert fp_rand(FR, rng) == PLONK_BETA_PIN
    assert fp_rand(FR, rng) == PLONK_GAMMA_PIN


# Reproduce (FRI): Transcript::<Sha256, Fq>::new() [digests 0 with index 0],
# digest(1), digest(2), digest(3), generate_a_challenge(); then digest(12345)
# and generate_challenge_list_usize(3) (fri/src/fiat_shamir/transcript.rs).
FRI_CHALLENGE_PIN = 18051018627881039884
FRI_USIZE_LIST_PIN = [
    15298309197798166161,
    5536522246155818856,
    12917888807722201296,
]
FRI_FR_CHALLENGE_PIN = (
    0x1AEC157E3871783CDBCF2A052D083DEDDF385B10497EBF645975E4D668D6C4F1
)


def test_fri_transcript_replay_pin():
    t = FriTranscript(GOLDILOCKS, 0)
    for m in (1, 2, 3):
        t.digest(m)
    assert t.generate_a_challenge() == FRI_CHALLENGE_PIN
    t.digest(12345)
    assert t.generate_challenge_list_usize(3) == FRI_USIZE_LIST_PIN
    t2 = FriTranscript(FR, 0)
    t2.digest(99)
    assert t2.generate_a_challenge() == FRI_FR_CHALLENGE_PIN
    # independent: chained SHA-256 of (prev || index_le_u64 || decimal str)
    d = hashlib.sha256(b"" + (0).to_bytes(8, "little") + b"0").digest()
    for i, m in enumerate((1, 2, 3), start=1):
        d = hashlib.sha256(d + i.to_bytes(8, "little") + str(m).encode()).digest()
    rng = StdRng.from_seed_u64(int.from_bytes(d[:8], "little"))
    assert (
        _fp_rand_independent(GOLDILOCKS.modulus, GOLDILOCKS.num_bits, rng)
        == FRI_CHALLENGE_PIN
    )


# Reproduce (Nova): Transcript::<Sha256>::default(), feed(G1 generator
# commitment), feed_scalar_num(5), feed_scalar_num(17), generate_challenges
# (nova/src/transcript.rs:17-115).
NOVA_CHALLENGE_PIN = (
    0x4DACEEE55B2F8B6E572FFAB19117D5AD4F8A0CACC96A38A50E2A13C76EB5F1FF
)


def test_nova_transcript_replay_pin():
    nt = NovaTranscript()
    nt.feed(G1Affine.generator())
    nt.feed_scalar_num(5)
    nt.feed_scalar_num(17)
    assert nt.generate_challenges(1)[0] == NOVA_CHALLENGE_PIN
    # independent digest chain: uncompressed G1 then 32-byte LE scalars
    d = hashlib.sha256(bytes.fromhex(G1_GEN_UNCOMPRESSED_HEX)).digest()
    d = hashlib.sha256(d + (5).to_bytes(32, "little")).digest()
    d = hashlib.sha256(d + (17).to_bytes(32, "little")).digest()
    rng = StdRng.from_seed_u64(int.from_bytes(d[:8], "little"))
    assert fp_rand(FR, rng) == NOVA_CHALLENGE_PIN
