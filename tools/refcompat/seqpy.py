"""Stand-in for the reference's ``seqpy`` C extension
(library/seqpy.c), whose ``s#`` argument parsing predates
PY_SSIZE_T_CLEAN and no longer compiles against modern CPython.

``revcomp`` reproduces the extension's exact 256-byte complement table
(seqpy.c:5-22): IUPAC complements for A-Z/a-z (U -> A like T), every
other byte maps to itself.  str.translate runs the same LUT loop in C,
so reference build scripts run at full speed.
"""

_FWD = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_CMP = "TVGHEFCDIJMLKNOPQYSAABWXRZ"
_TABLE = str.maketrans(_FWD + _FWD.lower(), _CMP + _CMP.lower())


def revcomp(seq: str) -> str:
    return seq.translate(_TABLE)[::-1]
