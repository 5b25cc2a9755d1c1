"""CAMI2 gold-standard read mapping -> Kraken-style report + filtered ID list
(reference: analysis/CAMIToKrakenReport.scala).

Input mapping format (TSV with header):
#anonymous_read_id  genome_id  tax_id  read_id
"""

from __future__ import annotations

import gzip
from typing import Dict, Optional

from ..report import KrakenReport
from ..taxonomy import Taxonomy


class CAMIToKrakenReport:
    def __init__(self, mapping_location: str, tax: Taxonomy, min_rank_depth: Optional[int]):
        self.tax = tax
        self.min_depth = min_rank_depth
        self.rows = []  # (anonymous id, taxon)
        op = gzip.open if mapping_location.endswith(".gz") else open
        with op(mapping_location, "rt") as f:
            header = True
            for line in f:
                if header:
                    header = False
                    continue
                parts = line.rstrip("\n").split("\t")
                if len(parts) < 3:
                    continue
                taxon = int(tax.primary[int(parts[2])])
                if self.min_depth is None or tax.depth(taxon) >= self.min_depth:
                    self.rows.append((parts[0], taxon))

    def write_filtered_ids(self, location: str):
        with open(location, "w") as f:
            for rid, _ in self.rows:
                f.write(rid + "\n")

    def write_filtered_report(self, location: str):
        """Counts by taxon, halved to convert single-mate rows to pair counts
        (CAMIToKrakenReport.scala:107-113)."""
        counts: Dict[int, int] = {}
        for _, taxon in self.rows:
            counts[taxon] = counts.get(taxon, 0) + 1
        pairs = [(t, c // 2) for t, c in sorted(counts.items())]
        KrakenReport(self.tax, pairs).write(location)
