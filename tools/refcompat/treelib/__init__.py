"""Drop-in shim for the ``treelib`` package (not installed in this
environment, zero egress) — just enough API for the reference
StrainScan identify path. See tree.py / node.py."""

from .node import Node
from .tree import Tree

__all__ = ["Tree", "Node"]
