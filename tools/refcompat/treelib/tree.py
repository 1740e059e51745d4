"""Minimal stand-in for treelib.tree covering the exact API surface the
reference identify path uses (library/identify.py, identify_low_mem.py,
identify_low_depth.py):

    Tree(); create_node(identifier=, parent=); get_node; all_nodes;
    leaves; children; parent; siblings; is_ancestor; paths_to_leaves.

Semantics mirror real treelib: insertion order is preserved (the
reference relies on ``all_nodes()[0]`` being the root, identify.py:417,
and on children order for the binomial descent), ``parent(root)`` is
None, ``siblings(root)`` is [], and ``paths_to_leaves`` yields lists of
identifiers root->leaf.
"""

from .node import Node


class Tree:
    def __init__(self):
        self._nodes = {}
        self._order = []
        self._children = {}
        self._parent = {}
        self.root = None

    def create_node(self, tag=None, identifier=None, parent=None, data=None):
        if identifier is None:
            raise ValueError("identifier required")
        if identifier in self._nodes:
            raise ValueError(f"duplicate node {identifier}")
        node = Node(tag=tag, identifier=identifier, data=data)
        if parent is None:
            if self.root is not None:
                raise ValueError("tree already has a root")
            self.root = identifier
            self._parent[identifier] = None
        else:
            pid = parent.identifier if isinstance(parent, Node) else parent
            if pid not in self._nodes:
                raise KeyError(f"parent {pid} not in tree")
            self._parent[identifier] = pid
            self._children[pid].append(identifier)
        self._nodes[identifier] = node
        self._order.append(identifier)
        self._children[identifier] = []
        return node

    def add_node(self, node, parent=None):
        """Insert an existing Node (Build_tree.py:70-76 constructs Node
        objects directly)."""
        if node.identifier in self._nodes:
            raise ValueError(f"duplicate node {node.identifier}")
        if parent is None:
            if self.root is not None:
                raise ValueError("tree already has a root")
            self.root = node.identifier
            self._parent[node.identifier] = None
        else:
            pid = parent.identifier if isinstance(parent, Node) else parent
            if pid not in self._nodes:
                raise KeyError(f"parent {pid} not in tree")
            self._parent[node.identifier] = pid
            self._children[pid].append(node.identifier)
        self._nodes[node.identifier] = node
        self._order.append(node.identifier)
        self._children[node.identifier] = []
        return node

    def __getitem__(self, nid):
        return self._nodes[nid]

    def __contains__(self, nid):
        return nid in self._nodes

    def __len__(self):
        return len(self._nodes)

    @staticmethod
    def _nid(x):
        """Accept a Node object or a bare identifier everywhere, like
        upstream treelib (Build_tree.py passes both, e.g. :86 vs :503)."""
        return x.identifier if isinstance(x, Node) else x

    def get_node(self, nid):
        return self._nodes.get(self._nid(nid))

    def all_nodes(self):
        return [self._nodes[i] for i in self._order]

    def leaves(self, nid=None):
        return [self._nodes[i] for i in self._order if not self._children[i]]

    def children(self, nid):
        return [self._nodes[i] for i in self._children[self._nid(nid)]]

    def parent(self, nid):
        pid = self._parent[self._nid(nid)]
        return None if pid is None else self._nodes[pid]

    def siblings(self, nid):
        pid = self._parent[self._nid(nid)]
        if pid is None:
            return []
        return [self._nodes[i]
                for i in self._children[pid] if i != self._nid(nid)]

    def is_ancestor(self, ancestor, grandchild):
        cur = self._parent.get(self._nid(grandchild))
        anc = self._nid(ancestor)
        while cur is not None:
            if cur == anc:
                return True
            cur = self._parent.get(cur)
        return False

    def depth(self, node=None, nid=None):
        if node is None and nid is None:
            return max((self.level(i) for i in self._order), default=0)
        return self.level(node if node is not None else nid)

    def level(self, nid):
        d = 0
        cur = self._parent.get(self._nid(nid))
        while cur is not None:
            d += 1
            cur = self._parent.get(cur)
        return d

    def paths_to_leaves(self):
        out = []
        for leaf in [i for i in self._order if not self._children[i]]:
            path = []
            cur = leaf
            while cur is not None:
                path.append(cur)
                cur = self._parent[cur]
            out.append(list(reversed(path)))
        return out
