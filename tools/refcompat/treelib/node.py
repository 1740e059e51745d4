"""Minimal stand-in for treelib.node (only what the reference identify
path touches: Node.identifier / .tag / .data — see
/root/reference/library/identify.py:37-70).

Class lives in ``treelib.node`` so pickles are interchangeable with the
real treelib package (tree.pkl written by Build_tree.py:531).
"""


class Node:
    def __init__(self, tag=None, identifier=None, data=None):
        self.identifier = identifier
        self.tag = tag if tag is not None else identifier
        self.data = data

    def __repr__(self):
        return f"Node(identifier={self.identifier!r})"
