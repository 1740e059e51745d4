"""FASTA parsing subset of Bio.SeqIO (see package docstring)."""


class _Record:
    __slots__ = ("id", "description", "seq")

    def __init__(self, rid, desc, seq):
        self.id = rid
        self.description = desc
        self.seq = seq  # plain str; reference code calls str(record.seq)


def parse(handle, fmt):
    if fmt != "fasta":
        raise ValueError(f"refcompat Bio.SeqIO only parses fasta, not {fmt}")
    close = False
    if isinstance(handle, str):
        handle = open(handle)
        close = True
    try:
        rid = None
        desc = ""
        chunks = []
        for line in handle:
            line = line.rstrip("\n")
            if line.startswith(">"):
                if rid is not None:
                    yield _Record(rid, desc, "".join(chunks))
                desc = line[1:].strip()
                rid = desc.split()[0] if desc else ""
                chunks = []
            elif rid is not None:
                chunks.append(line.strip())
        if rid is not None:
            yield _Record(rid, desc, "".join(chunks))
    finally:
        if close:
            handle.close()
