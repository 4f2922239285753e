"""Checkpoint/resume round-trip tests (the reference persists nothing —
SURVEY.md §5; this covers the new framework's npz/json serialization)."""
import pytest

from zktpu.compat import (
    load_fri_proof,
    load_ivc_state,
    load_plonk_proof,
    load_srs,
    save_fri_proof,
    save_ivc_state,
    save_plonk_proof,
    save_srs,
)
from zktpu.fields.host import FR, GOLDILOCKS
from zktpu.fri.prover import generate_proof as fri_prove
from zktpu.fri.verifier import verify as fri_verify
from zktpu.kzg import Srs
from zktpu.poly.poly import Poly


def test_srs_roundtrip(tmp_path):
    srs = Srs.new_from_secret(777, 6)
    path = str(tmp_path / "srs.npz")
    save_srs(path, srs)
    srs2 = load_srs(path)
    assert srs2 == srs


def test_srs_rejects_unversioned_checkpoint(tmp_path):
    """Pre-versioning files stored Jacobian coords; silently decoding them
    as projective would corrupt every derived commitment — must reject."""
    import numpy as np
    import pytest

    srs = Srs.new_from_secret(777, 6)
    path = str(tmp_path / "srs_old.npz")
    save_srs(path, srs)
    data = dict(np.load(path, allow_pickle=False))
    del data["format"]  # simulate a pre-versioning checkpoint
    np.savez_compressed(path, **data)
    with pytest.raises(ValueError, match="format mismatch"):
        load_srs(path)


def test_fri_proof_roundtrip(tmp_path):
    poly = Poly.from_ints(GOLDILOCKS, [1, 2, 3, 4, 5, 6])
    proof = fri_prove(poly, blowup_factor=2, number_of_queries=2)
    path = str(tmp_path / "fri.json")
    save_fri_proof(path, proof)
    proof2 = load_fri_proof(path)
    fri_verify(proof2)  # must not raise


def test_plonk_proof_roundtrip(tmp_path):
    from zktpu.plonk.parser import Parser
    from zktpu.plonk.prover import generate_proof
    from zktpu.plonk.verifier import verify
    from zktpu.transcript.chacha import StdRng

    p = Parser()
    p.add_witness("x", 1)
    p.add_witness("y", 2)
    p.add_witness("z", 3)
    compiled = p.parse("x*y+3*x^2+x*y*z=11").compile()
    srs = Srs.new_from_secret(999, compiled.size)
    proof = generate_proof(compiled, srs, rng=StdRng.from_seed_u64(2))
    path = str(tmp_path / "plonk.json")
    save_plonk_proof(path, proof)
    proof2 = load_plonk_proof(path)
    assert proof2 == proof
    verify(compiled, srs, proof2)  # must not raise


def test_ivc_state_roundtrip(tmp_path):
    from zktpu.kzg import KzgScheme
    from zktpu.nova.circuit import AugmentedCircuit, State
    from zktpu.nova.r1cs import create_trivial_pair

    srs = Srs.new_from_secret(5, 8)
    scheme = KzgScheme(srs)
    _w, trivial_instance = create_trivial_pair(1, 4, scheme)
    circ = AugmentedCircuit(None, trivial_instance, State(42))
    circ.i = 3
    circ.z_i = State(100)
    circ.h_i = 0xDEADBEEF
    path = str(tmp_path / "ivc.json")
    save_ivc_state(path, circ)
    circ2 = load_ivc_state(path, None)
    assert circ2.i == 3
    assert circ2.z_0.state == 42 and circ2.z_i.state == 100
    assert circ2.h_i == 0xDEADBEEF and circ2.h_i1 is None
    assert circ2.trivial_instance.com_e == trivial_instance.com_e
    assert circ2.trivial_instance.x == trivial_instance.x
