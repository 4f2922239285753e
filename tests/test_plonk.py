"""PLONK end-to-end tests (mirror plonk/src/verifier.rs:222-383 and
plonk/src/circuit.rs:248-282)."""
import pytest

from zktpu.fields import host
from zktpu.kzg import Srs
from zktpu.plonk.circuit import Circuit
from zktpu.plonk.prover import generate_proof
from zktpu.plonk.verifier import PlonkVerificationError, verify
from zktpu.transcript.chacha import StdRng

FR = host.FR


def _pythagorean_circuit(c_val=25):
    # x^2 + y^2 = z^2 with (3,4,5) (verifier.rs:813-840)
    circuit = Circuit()
    circuit.add_multiplication_gate((1, 0, 3), (0, 0, 3), (0, 3, 9), 0)
    circuit.add_multiplication_gate((1, 1, 4), (0, 1, 4), (1, 3, 16), 0)
    circuit.add_multiplication_gate((1, 2, 5), (0, 2, 5), (2, 3, c_val), 0)
    circuit.add_addition_gate((2, 0, 9), (2, 1, 16), (2, 2, c_val), 0)
    return circuit


def test_circuit_builder_wiring():
    # circuit.rs:248-282: copied wires share values
    circuit = Circuit()
    circuit.add_multiplication_gate((0, 0, 1), (0, 0, 1), (2, 0, 1), 0)
    circuit.add_multiplication_gate((0, 0, 1), (1, 1, 2), (2, 1, 2), 0)
    circuit.add_addition_gate((2, 1, 2), (1, 2, -3), (2, 2, -1), 0)
    circuit.add_addition_gate((2, 0, 1), (2, 2, -1), (2, 3, 0), 0)
    assert circuit.vals[0][2] == circuit.vals[2][1]


def test_pad_panics_on_tiny_circuit():
    circuit = Circuit()
    circuit.add_addition_gate((0, 0, 1), (1, 0, 1), (2, 0, 2), 0)
    with pytest.raises(ValueError):
        circuit.compile()


@pytest.fixture(scope="module")
def pythagorean_setup():
    compiled = _pythagorean_circuit().compile()
    srs = Srs.new_from_secret(1234567, compiled.size)
    return compiled, srs


def test_plonk_accept_pythagorean(pythagorean_setup):
    compiled, srs = pythagorean_setup
    proof = generate_proof(compiled, srs, rng=StdRng.from_seed_u64(42))
    verify(compiled, srs, proof)  # must not raise


def test_plonk_deterministic_with_seeded_blinding(pythagorean_setup):
    compiled, srs = pythagorean_setup
    p1 = generate_proof(compiled, srs, rng=StdRng.from_seed_u64(7))
    p2 = generate_proof(compiled, srs, rng=StdRng.from_seed_u64(7))
    assert p1.a_commit == p2.a_commit and p1.u == p2.u
    p3 = generate_proof(compiled, srs, rng=StdRng.from_seed_u64(8))
    assert p1.a_commit != p3.a_commit


def test_plonk_reject_bad_witness():
    # verifier.rs:849-884 (should_panic): prover's internal exactness
    # assertions trip on an unsatisfied circuit
    compiled = _pythagorean_circuit(c_val=20).compile()
    srs = Srs.new_from_secret(999, compiled.size)
    with pytest.raises(AssertionError):
        generate_proof(compiled, srs, rng=StdRng.from_seed_u64(1))


def test_plonk_tampered_proof_rejected(pythagorean_setup):
    compiled, srs = pythagorean_setup
    proof = generate_proof(compiled, srs, rng=StdRng.from_seed_u64(3))
    proof.bar_a = FR.add(proof.bar_a, 1)
    with pytest.raises(PlonkVerificationError):
        verify(compiled, srs, proof)


def test_plonk_accept_xyz6():
    # xyz = 6 (verifier.rs:941-963)
    circuit = Circuit()
    circuit.add_multiplication_gate((0, 0, 1), (1, 0, 2), (0, 1, 2), 0)
    circuit.add_multiplication_gate((2, 0, 2), (1, 1, 3), (2, 1, 6), 0)
    compiled = circuit.compile()
    srs = Srs.new_from_secret(55, compiled.size)
    proof = generate_proof(compiled, srs, rng=StdRng.from_seed_u64(11))
    verify(compiled, srs, proof)


def test_plonk_accept_example_circuit():
    # xy + 3x^2 + xyz = 11 (verifier.rs:886-939 / plonk/examples/example.rs)
    circuit = Circuit()
    circuit.add_multiplication_gate((0, 1, 1), (1, 0, 2), (0, 3, 2), 0)
    circuit.add_multiplication_gate((1, 1, 1), (0, 0, 1), (0, 2, 1), 0)
    circuit.add_multiplication_gate((2, 1, 1), (2, 6, 3), (1, 3, 3), 0)
    circuit.add_addition_gate((0, 4, 2), (2, 2, 3), (0, 5, 5), 0)
    circuit.add_multiplication_gate((2, 0, 2), (1, 4, 3), (1, 5, 6), 0)
    circuit.add_addition_gate((2, 3, 5), (2, 4, 6), (2, 5, 11), 0)
    circuit.add_constant_gate((0, 6, 3), (1, 6, 0), (1, 2, 3), 0)
    compiled = circuit.compile()
    srs = Srs.new_from_secret(777, compiled.size)
    proof = generate_proof(compiled, srs, rng=StdRng.from_seed_u64(13))
    verify(compiled, srs, proof)


def test_quotient_4n_path_matches_8n_path():
    """The evaluation-form 4n permutation-quotient path (used above
    ZKTPU_QUOTIENT_8N_MAX_N to halve the largest FFT domain) must produce a
    byte-identical proof to the exact 8n path, and verify."""
    import zktpu.config as cfg
    from zktpu.kzg import Srs
    from zktpu.plonk.parser import Parser
    from zktpu.plonk.prover import generate_proof
    from zktpu.plonk.verifier import verify
    from zktpu.transcript.chacha import StdRng

    parser = Parser()
    for name, value in (("x", 1), ("y", 2), ("z", 3)):
        parser.add_witness(name, value)
    compiled = parser.parse("x*y+3*x^2+x*y*z=11").compile()
    srs = Srs.new_from_secret(0x5EED, compiled.size)
    saved = cfg.QUOTIENT_8N_MAX_N
    try:
        cfg.QUOTIENT_8N_MAX_N = 1 << 19
        p8 = generate_proof(compiled, srs, StdRng.from_seed_u64(7))
        cfg.QUOTIENT_8N_MAX_N = 4
        p4 = generate_proof(compiled, srs, StdRng.from_seed_u64(7))
    finally:
        cfg.QUOTIENT_8N_MAX_N = saved
    assert p4 == p8
    verify(compiled, srs, p4)
