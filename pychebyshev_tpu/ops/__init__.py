from pychebyshev_tpu.ops import chebyshev, dct, eval as eval_ops, quadrature

__all__ = ["chebyshev", "dct", "eval_ops", "quadrature"]
