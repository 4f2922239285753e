"""Nova tests mirroring the reference suite:
r1cs satisfaction (nova/src/r1cs/mod.rs:128-169), prover folding keeps
satisfaction (nifs/nifs_prover.rs:68-115), full one-fold round trip
(nifs/nifs_verifier.rs:146-210), and the 4-step IVC loop
(nova/examples/examples.rs:24-151 / ivc_verifier.rs:79-447).
"""
import pytest

from zktpu.fields import host
from zktpu.fields.fp import device_field
from zktpu.kzg import Srs, KzgScheme
from zktpu.nova.circuit import AugmentedCircuit, FCircuit, State, base_to_scalar, hash_io
from zktpu.nova.ivc import IVC, IVCProof, ZkIVCProof
from zktpu.nova.nifs import NIFS, gen_test_values
from zktpu.nova.r1cs import FInstance, FWitness, NovaError, create_trivial_pair, is_r1cs_satisfied
from zktpu.transcript.transcripts import NovaTranscript

FR = host.FR
FRD = device_field(FR)


class TestCircuitF(FCircuit):
    def run(self, z_i: State, w_i: FWitness) -> State:
        x = FRD.decode_int(w_i.w[0])
        res = (x**3 + x + 5) % FR.modulus
        base_res = host.FQ.from_le_bytes_mod_order(res.to_bytes(32, "little"))
        return State(state=(z_i.state + base_res) % host.FQ.modulus)


@pytest.fixture(scope="module")
def setup():
    r1cs, witnesses, x = gen_test_values([3, 4, 1, 2])
    domain_size = len(witnesses[0]) + len(x[0]) + 1
    srs = Srs.new_from_secret(424242, domain_size)
    scheme = KzgScheme(srs)
    m = r1cs.matrix_a.shape[0]
    w = [FWitness.new(wi, m) for wi in witnesses]
    u = [wi.commit(scheme, xi) for wi, xi in zip(w, x)]
    return r1cs, witnesses, x, scheme, w, u


def test_r1cs_satisfaction(setup):
    r1cs, witnesses, x, scheme, w, u = setup
    is_r1cs_satisfied(r1cs, u[0], w[0], scheme)  # must not raise
    # negative: tamper a witness entry
    bad = FWitness(e=w[0].e, w=FRD.encode_ints([9, 9, 27, 30]))
    bad_u = bad.commit(scheme, x[0])
    with pytest.raises(NovaError):
        is_r1cs_satisfied(r1cs, bad_u, bad, scheme)


def test_prover_folding_satisfied(setup):
    r1cs, witnesses, x, scheme, w, u = setup
    transcript = NovaTranscript()
    folded_w, folded_u, _, _ = NIFS.prover(r1cs, w[0], w[1], u[0], u[1], scheme, transcript)
    is_r1cs_satisfied(r1cs, folded_u, folded_w, scheme)


def test_one_fold_roundtrip(setup):
    r1cs, witnesses, x, scheme, w, u = setup
    pt = NovaTranscript()
    vt = NovaTranscript()
    fw, fu, com_t, r = NIFS.prover(r1cs, w[0], w[1], u[0], u[1], scheme, pt)
    proof = NIFS.prove(r, fw, fu, scheme, pt)
    v_folded = NIFS.verifier(r, u[0], u[1], com_t)
    NIFS.verify(proof, u[0], u[1], v_folded, com_t, scheme, vt)  # must not raise
    # tampered r rejected
    vt2 = NovaTranscript()
    bad = type(proof)(FR.add(proof.r, 1), proof.opening_point, proof.opening_e, proof.opening_w)
    with pytest.raises(NovaError):
        NIFS.verify(bad, u[0], u[1], v_folded, com_t, scheme, vt2)


def test_ivc_four_steps(setup):
    r1cs, witnesses, x, scheme, w, u_orig = setup
    u = list(u_orig)
    x_len = len(x[0])

    trivial_witness, trivial_instance = create_trivial_pair(x_len, len(witnesses[0]), scheme)
    f_circuit = TestCircuitF()

    z = [State(0)]
    for index in range(1, 5):
        z.append(f_circuit.run(z[index - 1], w[index - 1]))

    verifier_transcript = NovaTranscript()
    augmented_circuit = AugmentedCircuit(f_circuit, trivial_instance, z[0])
    ivc = IVC(scheme, augmented_circuit)

    ivc_proof = IVCProof.trivial_ivc_proof(trivial_instance, trivial_witness)
    zk_ivc_proof = ZkIVCProof.trivial_zk_ivc_proof(trivial_instance)
    folded_witness = trivial_witness
    folded_instance = trivial_instance

    for step in range(4):
        if step == 0:
            ivc.augmented_circuit.run(u[step], None, w[step], None)
        else:
            ivc.augmented_circuit.run(
                ivc_proof.u_i, ivc_proof.big_u_i, ivc_proof.w_i, zk_ivc_proof.com_t
            )
        ivc.verify(zk_ivc_proof, verifier_transcript)  # must not raise

        if step != 3:
            ivc.augmented_circuit.next_step()
            i = step + 1
            assert ivc.augmented_circuit.z_i.state == z[step + 1].state
            prover_transcript = NovaTranscript()
            verifier_transcript = NovaTranscript()

            hash_x = hash_io(i, z[0], z[step + 1], folded_instance)
            u[step + 1] = FInstance(
                com_e=u[step + 1].com_e,
                u=u[step + 1].u,
                com_w=u[step + 1].com_w,
                x=[base_to_scalar(hash_x)],
            )
            ivc_proof = IVCProof(u[step + 1], w[step + 1], folded_instance, folded_witness)
            folded_witness, folded_instance, zk_ivc_proof = ivc.prove(
                r1cs, ivc_proof, prover_transcript
            )


def test_augmented_circuit_rejects_wrong_io(setup):
    r1cs, witnesses, x, scheme, w, u = setup
    _tw, trivial_instance = create_trivial_pair(len(x[0]), len(witnesses[0]), scheme)
    f_circuit = TestCircuitF()
    circ = AugmentedCircuit(f_circuit, trivial_instance, State(0))
    circ.i = 1
    circ.h_i = 123456
    with pytest.raises(NovaError):
        circ.run(u[0], u[1], w[0], u[0].com_e)
