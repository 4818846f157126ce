"""bunmpc_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of the BUNMPC reference stack: batched biconvex whole-body MPC
(centroidal ADMM + kinematic DDP), in-graph quadruped simulation, and the
iterative safe-learning loop (BC / DAgger / SafeDAgger / LocoSafeDagger /
Bayesian goal search), scaled over device meshes."""

__version__ = "0.1.0"
