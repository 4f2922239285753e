"""Parser + CPI tests (mirror plonk/src/parser.rs:420-610 and
plonk/src/common_preprocessed_input/cpi_parser.rs:423-491)."""
import pytest

from zktpu.fields import host
from zktpu.kzg import Srs, KzgScheme
from zktpu.plonk.circuit import Circuit
from zktpu.plonk.cpi import CPIGenerator
from zktpu.plonk.parser import Parser, parse_string
from zktpu.plonk.prover import generate_proof
from zktpu.plonk.verifier import PlonkVerificationError, verify
from zktpu.transcript.chacha import StdRng

FR = host.FR


def _xyz_parser(x=1, y=2, z=3):
    p = Parser()
    p.add_witness("x", x)
    p.add_witness("y", y)
    p.add_witness("z", z)
    return p


def test_parse_string_normalization():
    # parser.rs:596-600
    assert parse_string("x * y + 3 * x ^ 2 + x * y * z = 11") == "x*y+3*x*x+x*y*z=11"


def test_parse_string_panics_on_symbol_exponent():
    # parser.rs:605-609
    with pytest.raises(ValueError):
        parse_string("x * y + 3 * x ^ x + x * y * z=0")


def test_parser_matches_hand_written_circuit():
    # parser.rs:483-565: gate-by-gate equality with the hand-written circuit
    generated = _xyz_parser().parse("x*y+3*x*x+x*y*z=11")

    hand = Circuit()
    hand.add_multiplication_gate((1, 2, 1), (1, 0, 2), (0, 4, 2), 0)
    hand.add_constant_gate((0, 2, 3), (1, 7, 0), (2, 1, 3), 0)
    hand.add_multiplication_gate((0, 1, 3), (1, 3, 1), (0, 3, 3), 0)
    hand.add_multiplication_gate((2, 2, 3), (0, 0, 1), (1, 4, 3), 0)
    hand.add_addition_gate((0, 5, 2), (2, 3, 3), (0, 6, 5), 0)
    hand.add_multiplication_gate((2, 0, 2), (1, 5, 3), (1, 6, 6), 0)
    hand.add_addition_gate((2, 4, 5), (2, 5, 6), (0, 8, 11), 0)
    hand.add_constant_gate((1, 8, FR.neg(11)), (1, 1, 0), (2, 7, FR.neg(11)), 0)
    hand.add_addition_gate((2, 6, 11), (0, 7, FR.neg(11)), (2, 8, 0), 0)

    assert generated.gates == hand.gates
    assert generated.vals == hand.vals


def test_parser_missing_witness_raises():
    # parser.rs:570-579 (should_panic)
    with pytest.raises(ValueError):
        _xyz_parser().parse("x*y+3*x*x+x*y*z*a=0")


@pytest.fixture(scope="module")
def srs20():
    return Srs.new_from_secret(31337, 20)


def test_parser_prover_e2e(srs20):
    # parser.rs:431-443
    compiled = _xyz_parser().parse("x*y+3*x^2+x*y*z=11").compile()
    proof = generate_proof(compiled, srs20, rng=StdRng.from_seed_u64(5))
    verify(compiled, srs20, proof)


def test_parser_cross_rejection(srs20):
    # parser.rs:446-467: proofs don't transfer across different equations
    c1 = _xyz_parser().parse("x*y+3*x^2+x*y*z=11").compile()
    p1 = generate_proof(c1, srs20, rng=StdRng.from_seed_u64(6))
    c2 = _xyz_parser(z=4).parse("x*y+3*x^2+x*y*z=13").compile()
    p2 = generate_proof(c2, srs20, rng=StdRng.from_seed_u64(6))
    with pytest.raises(PlonkVerificationError):
        verify(c1, srs20, p2)
    with pytest.raises(PlonkVerificationError):
        verify(c2, srs20, p1)


def test_parser_negative_witness(srs20):
    # parser.rs:583-593
    compiled = _xyz_parser(x=-1, y=-2, z=-3).parse("x*y+3*x*x+x*y*z=-1").compile()
    proof = generate_proof(compiled, srs20, rng=StdRng.from_seed_u64(9))
    verify(compiled, srs20, proof)


def test_cpi_matches_prover_commitments(srs20):
    # cpi_parser.rs:433-490: CPI commitments equal prover-side commitments
    eq = "x*y+3*x^2+x*y*z=11"
    scheme = KzgScheme(srs20)
    cpi = CPIGenerator().compute_common_preprocessed_input(eq, scheme)
    compiled = _xyz_parser().parse(eq).compile()
    gc, cc = compiled.gate_constraints, compiled.copy_constraints
    assert cpi.n == compiled.size
    assert cpi.k1 == cc.k1 and cpi.k2 == cc.k2
    assert cpi.com_q_lx == scheme.commit(gc.q_lx)
    assert cpi.com_q_rx == scheme.commit(gc.q_rx)
    assert cpi.com_q_mx == scheme.commit(gc.q_mx)
    assert cpi.com_q_ox == scheme.commit(gc.q_ox)
    assert cpi.com_q_cx == scheme.commit(gc.q_cx)
    assert cpi.com_s_sigma_1 == scheme.commit(cc.s_sigma_1)
    assert cpi.com_s_sigma_2 == scheme.commit(cc.s_sigma_2)
    assert cpi.com_s_sigma_3 == scheme.commit(cc.s_sigma_3)
    assert cpi.pi_x.to_ints() == gc.pi_x.to_ints()
