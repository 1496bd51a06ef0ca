"""dusk_blindbidproof_tpu — a TPU-native Bulletproofs R1CS + BlindBid framework.

A from-scratch re-design of the capability stack of
dusk-network/dusk-blindbidproof (a Rust Bulletproofs/BlindBid prover daemon,
see SURVEY.md) for TPU hardware:

  * ``ops``      — batched field/scalar/point arithmetic and MSM as JAX/Pallas
                   programs over int32 limb vectors (device compute path).
  * ``models``   — the proof system: R1CS constraint builder, gadget library
                   (MiMC, one-of-many, score), Bulletproofs prover/verifier,
                   inner-product argument, and the BlindBid circuit.
  * ``parallel`` — mesh sharding: batched proving over a ``bids`` axis and
                   partitioned MSM with psum bucket reduction.
  * ``utils``    — host-side transcript (Keccak/STROBE/Merlin), generator
                   setup, TLV wire codec, errors.
  * ``server``   — asyncio Unix-domain-socket front-end speaking the
                   reference's opcode-1/2 protocol (SURVEY.md §8.1).
"""

__version__ = "0.1.0"
