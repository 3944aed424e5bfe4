"""Serialization round-trips (reference: src/serialization.rs:157-329).

Host-only and fast: round-tripping needs structurally valid objects (points
on curve, fields in range), not cryptographically valid proofs.
"""

import numpy as np
import pytest

from plonky_tpu.curves import TWEEDLEDEE, host as chost
from plonky_tpu.protocol.proof import OpeningSet, Proof, SchnorrProof
from plonky_tpu.protocol import cbor
from plonky_tpu.protocol.serialization import (
    field_from_bytes,
    field_to_bytes,
    point_from_bytes,
    point_to_bytes,
    proof_from_bytes,
    proof_from_cbor,
    proof_to_bytes,
    proof_to_cbor,
    vk_from_bytes,
    vk_from_cbor,
    vk_to_bytes,
    vk_to_cbor,
)
from plonky_tpu.protocol.verifier import VerificationKey

CURVE = TWEEDLEDEE
SF = CURVE.scalar
rng = np.random.default_rng(99)


def rand_field(spec):
    return int.from_bytes(rng.bytes(40), "little") % spec.p


def rand_point():
    g = chost.generator(CURVE)
    return chost.mul(g, int(rng.integers(1, 1 << 62)))


def rand_points(n):
    return [rand_point() for _ in range(n)]


def rand_opening_set(n_old):
    return OpeningSet(
        o_constants=[rand_field(SF) for _ in range(6)],
        o_plonk_sigmas=[rand_field(SF) for _ in range(6)],
        o_wires=[rand_field(SF) for _ in range(9)],
        o_plonk_z=rand_field(SF),
        o_plonk_t=[rand_field(SF) for _ in range(7)],
        o_old_proofs=[rand_field(SF) for _ in range(n_old)],
        o_pi_quotient=rand_field(SF),
    )


def test_field_roundtrip():
    for _ in range(20):
        x = rand_field(SF)
        assert field_from_bytes(SF, field_to_bytes(SF, x)) == x
    with pytest.raises(ValueError):
        field_from_bytes(SF, SF.p.to_bytes(SF.bytes_, "little"))


def test_point_roundtrip_compressed():
    """Compressed points: sign byte + x, y recovered by square root
    (reference: serialization.rs:32-72)."""
    for _ in range(10):
        pt = rand_point()
        assert point_from_bytes(CURVE, point_to_bytes(CURVE, pt)) == pt
    z = chost.zero_point(CURVE)
    assert point_from_bytes(CURVE, point_to_bytes(CURVE, z)) == z


def test_proof_roundtrip():
    n_old = 2
    dp = 5
    proof = Proof(
        c_wires=rand_points(9),
        c_plonk_z=rand_point(),
        c_plonk_t=rand_points(7),
        c_pis_quotient=rand_point(),
        o_local=rand_opening_set(n_old),
        o_right=rand_opening_set(n_old),
        o_below=rand_opening_set(n_old),
        halo_l=rand_points(dp),
        halo_r=rand_points(dp),
        halo_g=rand_point(),
        schnorr_proof=SchnorrProof(rand_point(), rand_field(SF),
                                   rand_field(SF)),
    )
    data = proof_to_bytes(CURVE, proof)
    back = proof_from_bytes(CURVE, data)
    assert back == proof
    # deterministic encoding
    assert proof_to_bytes(CURVE, back) == data


def test_vk_roundtrip_and_size():
    vk = VerificationKey(
        c_constants=rand_points(6),
        c_s_sigmas=rand_points(6),
        degree=1 << 10,
        num_public_inputs=3,
        num_gates_without_pis=1000,
        security_bits=128,
        curve=CURVE,
    )
    data = vk_to_bytes(vk)
    back = vk_from_bytes(CURVE, data)
    assert back.c_constants == vk.c_constants
    assert back.c_s_sigmas == vk.c_s_sigmas
    assert (back.degree, back.num_public_inputs,
            back.num_gates_without_pis, back.security_bits) == (
        vk.degree, vk.num_public_inputs, vk.num_gates_without_pis, 128)
    # 12 compressed points + 4 u32s (reference reports vk size similarly,
    # serialization.rs:280-323)
    assert len(data) == 2 * 4 + 12 * (1 + CURVE.base.bytes_) + 4 * 4


def test_cbor_primitives():
    """Canonical CBOR subset: round-trips and stable byte-level encoding
    (reference ships serde_cbor containers, serialization.rs:157-329)."""
    values = [0, 23, 24, 255, 256, 1 << 32, b"", b"\x01\x02", "hi",
              [1, b"x", "y", []], {"b": 1, "a": [2, 3]}]
    for v in values:
        assert cbor.decode(cbor.encode(v)) == v
    # RFC 8949 appendix A spot checks
    assert cbor.encode(0) == bytes([0x00])
    assert cbor.encode(24) == bytes([0x18, 24])
    assert cbor.encode(1000) == bytes([0x19, 0x03, 0xE8])
    assert cbor.encode("a") == bytes([0x61, 0x61])
    assert cbor.encode([1, 2]) == bytes([0x82, 0x01, 0x02])
    # canonical: map key order does not affect the encoding
    assert cbor.encode({"x": 1, "a": 2}) == cbor.encode({"a": 2, "x": 1})
    with pytest.raises(ValueError):
        cbor.decode(cbor.encode(5) + b"\x00")   # trailing bytes


def test_proof_cbor_roundtrip():
    n_old = 1
    dp = 4
    proof = Proof(
        c_wires=rand_points(9),
        c_plonk_z=rand_point(),
        c_plonk_t=rand_points(7),
        c_pis_quotient=rand_point(),
        o_local=rand_opening_set(n_old),
        o_right=rand_opening_set(n_old),
        o_below=rand_opening_set(n_old),
        halo_l=rand_points(dp),
        halo_r=rand_points(dp),
        halo_g=rand_point(),
        schnorr_proof=SchnorrProof(rand_point(), rand_field(SF),
                                   rand_field(SF)),
    )
    data = proof_to_cbor(CURVE, proof)
    assert proof_from_cbor(CURVE, data) == proof
    # self-describing: the container names its own format and curve
    obj = cbor.decode(data)
    assert obj["format"] == "plonky_tpu.proof"
    assert obj["curve"] == CURVE.name
    # deterministic (canonical) encoding
    assert proof_to_cbor(CURVE, proof) == data
    # wrong-curve rejection
    from plonky_tpu.curves import TWEEDLEDUM
    with pytest.raises(ValueError):
        proof_from_cbor(TWEEDLEDUM, data)


def test_vk_cbor_roundtrip():
    vk = VerificationKey(
        c_constants=rand_points(6),
        c_s_sigmas=rand_points(6),
        degree=1 << 10,
        num_public_inputs=3,
        num_gates_without_pis=1000,
        security_bits=128,
        curve=CURVE,
    )
    data = vk_to_cbor(vk)
    back = vk_from_cbor(CURVE, data)
    assert back.c_constants == vk.c_constants
    assert back.c_s_sigmas == vk.c_s_sigmas
    assert back.degree == vk.degree
