"""Minimal bidict stand-in for running the reference's build scripts
(library/Build_tree.py:8) in this image, which has no bidict package.

Original dict-pair implementation of just the surface the reference
uses: item set/get/del, iteration, ``len``, ``in``, and the ``.inv``
view.  Unlike upstream bidict this is PERMISSIVE about transient
duplicate values: the reference's cluster-id renumbering loop
(Build_tree.py:58-64) decrements values in dict order, which can pass
through states where two keys briefly share a value; upstream bidict
tolerates it there only because the final state is unique again.  ``inv``
maps each value to the key that most recently received it, which is
exactly the reference's post-loop expectation.
"""


class bidict:
    def __init__(self, *args, **kw):
        self._fwd = dict(*args, **kw)
        self._rebuild()

    def _rebuild(self):
        self._inv = {v: k for k, v in self._fwd.items()}

    # mapping surface -----------------------------------------------------
    def __setitem__(self, k, v):
        old = self._fwd.get(k, _MISSING)
        if old is not _MISSING and self._inv.get(old) == k:
            del self._inv[old]
        self._fwd[k] = v
        self._inv[v] = k

    def __getitem__(self, k):
        return self._fwd[k]

    def __delitem__(self, k):
        v = self._fwd.pop(k)
        if self._inv.get(v) == k:
            del self._inv[v]

    def __contains__(self, k):
        return k in self._fwd

    def __iter__(self):
        return iter(self._fwd)

    def __len__(self):
        return len(self._fwd)

    def keys(self):
        return self._fwd.keys()

    def values(self):
        return self._fwd.values()

    def items(self):
        return self._fwd.items()

    def get(self, k, default=None):
        return self._fwd.get(k, default)

    def copy(self):
        return bidict(self._fwd)

    @property
    def inv(self):
        return self._inv

    inverse = inv


class _Missing:
    pass


_MISSING = _Missing()
