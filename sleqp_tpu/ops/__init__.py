"""Numerical kernels: KKT solves, trust-region CG, bounded-variable simplex."""
