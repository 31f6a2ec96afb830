"""Device-resident prover: the full proving pipeline on TPU.

Everything bulk — traces, the stacked polynomial, eq tables, GKR layers,
WHIR folds/DFTs/Merkle trees, the Fiat-Shamir challenger itself — lives
on device in Montgomery form. The host orchestrates shapes only; no
device->host synchronization happens until the final single fetch of the
(transcript || merkle openings) buffer.

Why: on the tunneled TPU a synchronous fetch costs ~35 ms while an async
dispatch costs ~60 us. A prover with per-round host Fiat-Shamir would pay
seconds of pure latency; threading the challenger state through device
arrays makes the whole proof one asynchronous dispatch stream.

Transcripts are bit-identical to the host prover (prover/prove.py) — the
default test suite asserts full-proof transcript equality on the CPU
backend.
"""
