"""Minimal stand-in for the `case-insensitive-dictionary` PyPI package so the
REFERENCE engine can be imported for differential testing (the sandbox has no
network to install the real one). Implements exactly the surface the reference
uses: construction via CaseInsensitiveDict[str, int]() and dict get/set/
contains with case-insensitive string keys.

The differential fuzz generates column names whose case matches the rules
EXACTLY, so this shim's behavior is identity-equivalent to a plain dict for
every generated case — a shim bug cannot masquerade as an engine divergence.
Written from the package's documented interface; no reference code copied.
"""

from __future__ import annotations


class CaseInsensitiveDict(dict):
    @classmethod
    def __class_getitem__(cls, _item):
        return cls

    @staticmethod
    def _k(key):
        return key.casefold() if isinstance(key, str) else key

    def __setitem__(self, key, value):
        super().__setitem__(self._k(key), value)

    def __getitem__(self, key):
        return super().__getitem__(self._k(key))

    def __contains__(self, key):
        return super().__contains__(self._k(key))

    def get(self, key, default=None):
        return super().get(self._k(key), default)

    def setdefault(self, key, default=None):
        return super().setdefault(self._k(key), default)

    def pop(self, key, *args):
        return super().pop(self._k(key), *args)
