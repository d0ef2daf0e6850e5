"""Minimal dense-backed stand-in for the `sparse` package.

The reference package (used as a test oracle) imports `sparse` for its
COO trace tensors; the real library is not installed in this image.
This stub wraps dense numpy arrays with the small API surface the
reference uses (COO.from_numpy, todense, transpose, opt_einsum's
'sparse' backend functions, and sparse.diagonal).  Results are
numerically identical to the real library, just without the memory
savings -- fine at test dimensions (d <= 6).
"""
import numpy as np


class COO:
    def __init__(self, data):
        self._data = np.asarray(data)

    @classmethod
    def from_numpy(cls, arr):
        return cls(arr)

    def todense(self):
        return self._data

    @property
    def shape(self):
        return self._data.shape

    @property
    def ndim(self):
        return self._data.ndim

    @property
    def dtype(self):
        return self._data.dtype

    @property
    def nnz(self):
        return int(np.count_nonzero(self._data))

    def transpose(self, axes=None):
        return COO(self._data.transpose(axes))

    @property
    def real(self):
        return self._data.real

    @property
    def imag(self):
        return self._data.imag

    def sum(self, axis=None):
        out = self._data.sum(axis=axis)
        return out if np.isscalar(out) or out.ndim == 0 else COO(out)

    def __array__(self, dtype=None, copy=None):
        return np.asarray(self._data, dtype=dtype)

    def __add__(self, other):
        return COO(self._data + _dense(other))

    __radd__ = __add__

    def __sub__(self, other):
        return COO(self._data - _dense(other))

    def __rsub__(self, other):
        return COO(_dense(other) - self._data)

    def __mul__(self, other):
        return COO(self._data * _dense(other))

    __rmul__ = __mul__

    def __neg__(self):
        return COO(-self._data)


def _dense(x):
    return x.todense() if isinstance(x, COO) else np.asarray(x)


def tensordot(a, b, axes=2, **kwargs):
    return COO(np.tensordot(_dense(a), _dense(b), axes=axes))


def einsum(*args, **kwargs):
    args = [a if isinstance(a, str) else _dense(a) for a in args]
    kwargs.pop('backend', None)
    return COO(np.einsum(*args, **kwargs))


def transpose(a, axes=None):
    return COO(_dense(a).transpose(axes))


def diagonal(a, offset=0, axis1=0, axis2=1):
    return COO(np.diagonal(_dense(a), offset=offset, axis1=axis1,
                           axis2=axis2))
