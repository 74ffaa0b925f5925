"""megagta_tpu — a TPU-native gene-targeted metagenomic assembler.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of MegaGTA
(HKU-BAL/MegaGTA): succinct de Bruijn graph construction from short reads,
multi-k de novo assembly, 6-frame protein-space seed finding, and
profile-HMM-guided graph search producing per-gene contigs.

Layer map (mirrors reference layers; see SURVEY.md):
  ops/       primitive DNA/k-mer/sort/rank-select ops (jnp + Pallas kernels)
  io/        sequence ingestion, binary read libs, packed read arenas
  graph/     SdBG (BOSS) builder + navigation runtime
  hmm/       HMMER3 parsing, profile HMM tables, search heuristic
  seeds/     6-frame translation + protein k-mer seed finding
  search/    HMM-guided graph search (serial oracle + batched wavefront)
  assembly/  intermediate-k de novo assembly (tips/bubbles/unitigs)
  parallel/  device mesh + sharding strategies
  pipeline/  multi-k driver, CLI, checkpointing
  models/    gene model resources (profile HMM families)
"""

__version__ = "0.1.0"
