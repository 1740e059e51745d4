"""Minimal Biopython stand-in so the reference's build scripts
(library/Build_tree.py:5 `from Bio import SeqIO`) can run in this image,
which has no Biopython.  Original code: only the FASTA-parsing surface
the reference actually touches (``SeqIO.parse(path_or_handle, "fasta")``
yielding records whose ``.seq`` str()-ifies to the sequence).
"""
