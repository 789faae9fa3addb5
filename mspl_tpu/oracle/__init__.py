"""Reference-equivalent PyTorch implementation (CPU).

Two jobs (VERDICT r1 items 5 + parity gate, BASELINE.json:5):
* end-to-end fp32 parity oracle for the flax/JAX models — same ops, same
  init, weights transplanted from the flax variable tree;
* the reference-equivalent performance anchor: the torch pipeline
  (N model forwards -> softmax -> label-space conversion -> fusion ->
  threshold) measured by bench_anchor.py gives `vs_baseline` in bench.py
  its "vs reference-equivalent" meaning.

torch is imported lazily; the main package never depends on it.
"""
