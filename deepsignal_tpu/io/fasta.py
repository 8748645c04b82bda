"""FASTA reference reading.

Contract follows ``deepsignal/utils/ref_reader.py``: sequences upper-cased,
contig name = first whitespace-delimited word after '>' (ref_reader.py:33-57).
"""

from __future__ import annotations

from ..core.constants import complement_seq, motif_sites_in_seq


class DNAReference:
    """Parse a FASTA file into contig-name -> sequence (ref_reader.py:33-57)."""

    def __init__(self, reffile: str):
        self._contignames: list[str] = []
        self._contigs: dict[str, str] = {}
        name = None
        parts: list[str] = []
        with open(reffile, "r") as rf:
            for line in rf:
                if line.startswith(">"):
                    if name is not None and parts:
                        self._contigs[name] = "".join(parts)
                        self._contignames.append(name)
                    name = line.strip()[1:].split(" ")[0]
                    parts = []
                else:
                    parts.append(line.strip().upper())
        if name is not None:
            self._contigs[name] = "".join(parts)
            self._contignames.append(name)

    def getcontigs(self) -> dict[str, str]:
        return self._contigs

    def getcontignames(self) -> list[str]:
        return self._contignames


def get_contig2len(ref_path: str) -> dict[str, int]:
    """contig name -> length map (ref_reader.py:7-13)."""
    ref = DNAReference(ref_path)
    return {name: len(seq) for name, seq in ref.getcontigs().items()}


class DNAContig:
    """Single-contig helper with CpG/motif site scans (ref_reader.py:60-89)."""

    def __init__(self, contigname: str, contigseq: str):
        self._name = contigname
        self._seq = contigseq
        self._len = len(contigseq)
        self._complementseq = complement_seq(contigseq)

    def getseq(self) -> str:
        return self._seq

    def getlen(self) -> int:
        return self._len

    def getcomplementseq(self) -> str:
        return self._complementseq

    def getname(self) -> str:
        return self._name

    def get_seq_CpG_sites(self):
        return motif_sites_in_seq(self._seq, ["CG"], 0).tolist()

    def get_comseq_CpG_sites(self):
        return motif_sites_in_seq(self._complementseq, ["CG"], 0).tolist()

    def get_subseq_start_sites_of_seq(self, subseq: str, offsetloc: int = 0):
        return motif_sites_in_seq(self._seq, [subseq], offsetloc).tolist()

    def get_subseq_start_sites_of_comseq(self, subseq: str, offsetloc: int = 0):
        return motif_sites_in_seq(self._complementseq, [subseq], offsetloc).tolist()
