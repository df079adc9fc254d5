"""cvxpylayers_tpu: a TPU-native differentiable convex optimization framework.

A from-scratch JAX/XLA/Pallas re-design of the capability stack behind
cvxpy/cvxpylayers (CVXPY canonicalization + diffcp/SCS/Clarabel/Moreau
solvers + framework layer wrappers): declare a parametrized convex program
once, compile it into fixed-sparsity affine maps from parameters to cone
program data, and solve/differentiate batches of instances natively on TPU
under jit/vmap/grad/pjit.
"""

__version__ = "0.1.0"
