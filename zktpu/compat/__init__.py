"""Compatibility & persistence layer.

The reference serializes nothing to disk (SURVEY.md §5: proofs are in-memory
structs, the SRS is only reconstructible via new_from_secret).  This package
adds what a deployable framework needs: npz/json checkpointing of SRS,
proofs, and IVC state — also the transport for golden-file tests against the
Rust reference (byte encodings via zktpu/transcript/serialize.py).
"""
from .checkpoint import (
    load_fri_proof,
    load_ivc_state,
    load_plonk_proof,
    load_srs,
    save_fri_proof,
    save_ivc_state,
    save_plonk_proof,
    save_srs,
)
