"""End-to-end recursion demo (reference: src/bin/recursion.rs).

Flow: build an inner circuit -> prove it -> verify natively -> build the
recursion circuit (verifier-in-a-circuit over the cycle partner, with the
REAL inner vk wired in, unlike the reference's dummy points) -> generate the
recursion witness -> prove the recursion circuit -> verify THAT proof
natively, carrying the inner proof's G-point as a deferred OldProof check.

Prints per-phase timings, like the reference binary.

Usage: python bin/recursion_demo.py [--inner-degree-pow N] [--check-only]
  --check-only stops after host constraint checking (no recursive proving;
  useful on machines where device compiles are slow).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner-degree-pow", type=int, default=8)
    ap.add_argument("--check-only", action="store_true")
    args = ap.parse_args()

    import plonky_tpu
    plonky_tpu.enable_compilation_cache()

    from plonky_tpu.circuit import CircuitBuilder, PartialWitness
    from plonky_tpu.circuit.gates import BufferGate
    from plonky_tpu.curves import TWEEDLEDEE, TWEEDLEDUM
    from plonky_tpu.protocol import generate_proof, verify_proof
    from plonky_tpu.protocol.checks import check_circuit_constraints
    from plonky_tpu.protocol.proof import OldProof
    from plonky_tpu.protocol.recursion import recursive_verification_circuit

    def phase(name):
        print(f"{name}...", flush=True)
        return time.time()

    def done(t0):
        print(f"  finished in {time.time() - t0:.2f}s", flush=True)

    # --- inner circuit: trivial, padded to the requested degree ----------
    t0 = phase("Generating inner circuit")
    builder = CircuitBuilder(TWEEDLEDUM, security_bits=128)
    while builder.num_gates() < (1 << args.inner_degree_pow) - 3:
        builder.add_gate_no_constants(BufferGate(builder.num_gates()))
    inner_circuit = builder.build(inner_curve=TWEEDLEDEE)
    done(t0)

    t0 = phase("Generating inner witness")
    inner_witness = inner_circuit.generate_witness(PartialWitness())
    done(t0)

    t0 = phase("Generating inner proof")
    inner_proof = generate_proof(inner_circuit, inner_witness,
                                 old_proofs=[], blinding=True)
    done(t0)

    t0 = phase("Verifying inner proof")
    inner_vk = inner_circuit.to_vk()
    # NOTE on OldProof chaining: the inner proof's deferred G-point check is
    # an OldProof over Tweedledum, so it can only be carried by the next
    # Tweedledum-side proof (recursion level 2) -- the 2-cycle alternates.
    # For this single-level demo we pay the linear G check here instead.
    verify_proof([], inner_proof, [], inner_vk, TWEEDLEDEE, verify_g=True)
    done(t0)

    t0 = phase("Generating recursion circuit")
    rc = recursive_verification_circuit(
        TWEEDLEDEE, TWEEDLEDUM, inner_circuit.degree_pow(),
        security_bits=128, num_public_inputs=0, num_old_proofs=0,
        inner_vk=inner_vk, light=args.check_only)
    done(t0)
    print(f"  gate count: {rc.circuit.degree()}")

    t0 = phase("Generating recursion witness")
    inputs = PartialWitness()
    rc.proof.populate_witness(inputs, inner_proof, [])
    recursion_witness = rc.circuit.generate_witness(inputs)
    done(t0)

    t0 = phase("Checking recursion circuit constraints (host)")
    check_circuit_constraints(rc.circuit, recursion_witness)
    done(t0)

    if args.check_only:
        print("check-only: all recursion constraints satisfied; skipping "
              "recursive proof generation")
        return

    t0 = phase("Generating recursion proof")
    recursion_proof = generate_proof(rc.circuit, recursion_witness,
                                     old_proofs=[], blinding=True)
    done(t0)

    t0 = phase("Verifying recursion proof")
    pis = rc.circuit.get_public_inputs(recursion_witness)
    print(f"  number of public inputs: {rc.circuit.num_public_inputs}")
    vk = rc.circuit.to_vk()
    verify_proof(pis, recursion_proof, [], vk, TWEEDLEDUM, verify_g=True)
    done(t0)
    print("Recursive proof verified.")


if __name__ == "__main__":
    main()
