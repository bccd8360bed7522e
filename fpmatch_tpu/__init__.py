"""fpmatch_tpu — TPU-native deep graph matching for fingerprint verification.

A brand-new JAX/XLA/Pallas/pjit framework (not a port) with the capabilities of
the reference PyTorch codebase `dayne-2stacks/Fingerprint-Matching-Code`:
fingerprint verification via neural graph matching over sweat-pore keypoint
graphs.

Layer map (bottom-up):
  core/        typed configs + fixed-shape padded graph pytrees
  ops/         pure-JAX graph-matching math (Sinkhorn, soft-top-k, affinities,
               factorized association-graph matvec, feature alignment)
  kernels/     Pallas TPU kernels for the hot ops (SpMM/SDDMM on the
               association graph)
  models/      Flax modules: ResNet-18 backbone, spline conv, association-graph
               GNN, AFA-U k-predictor, match classifier, full NGM network
  data/        host-side data pipeline: datasets, benchmarks (pair protocols),
               keypoint-aware augmentation, Delaunay graph build, collation
  parallel/    mesh/sharding helpers; edge-partitioned association graphs
  train/       stage-curriculum training (optax multi-transform), checkpoints
  evaluation/  matching metrics + verification ROC/EER/FAR/FRR
  poredet/     pore-detection sub-framework (patch CNNs, NMS, DPF)

Design stance: fixed-shape padded batches with masks everywhere, COO/edge-list
sparse representations (never CSR/CSC pointer chasing), vmapped single-pair
functions instead of Python batch loops, shard_map meshes instead of
DataParallel, and a host-side (CPU) pipeline for augmentation/Delaunay/
Hungarian.
"""

__version__ = "0.1.0"
