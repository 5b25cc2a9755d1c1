"""Index statistics and inspection reports (reference: IndexStatistics.scala,
KeyValueIndex.report/kmerDepthHistogram, KeyValueIndex.scala:240-344)."""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from .report import KrakenReport
from .taxonomy import Taxonomy, depth_to_title


def depth_histograms(idx) -> Tuple[List[Tuple[int, str, int]], List[Tuple[int, str, int]]]:
    """(minimizer-depth histogram, taxon-depth histogram): rows of
    (depth, rank title, count) sorted by depth (KeyValueIndex.scala:326-336)."""
    depth_std = idx.taxonomy.depth_std
    kd = depth_std[idx.taxa]
    kmer_rows = []
    for d in sorted(set(kd.tolist())):
        kmer_rows.append((int(d), depth_to_title(int(d)) or str(d), int((kd == d).sum())))
    taxa_u = np.unique(idx.taxa)
    td = depth_std[taxa_u]
    taxon_rows = []
    for d in sorted(set(td.tolist())):
        taxon_rows.append((int(d), depth_to_title(int(d)) or str(d), int((td == d).sum())))
    return kmer_rows, taxon_rows


def taxon_coverage_stats(idx) -> Dict[str, float]:
    """Fraction of minimizers assigned at leaf taxa vs lifted to ancestors
    (IndexStatistics.scala:61-111 summary)."""
    per_taxon = idx.records_per_taxon()
    leaf = sum(c for t, c in per_taxon.items() if idx.taxonomy.is_leaf(t))
    total = sum(per_taxon.values())
    return {
        "total_minimizers": total,
        "leaf_minimizers": leaf,
        "leaf_fraction": leaf / total if total else 0.0,
    }


def show_coverage_stats(idx, library):
    """Per-taxon coverage of library taxa in the index."""
    per_taxon = idx.records_per_taxon()
    lib_taxa = sorted({t for t in library.labels.values()})
    present = [t for t in lib_taxa if per_taxon.get(t, 0) > 0]
    print(f"Library taxa: {len(lib_taxa)}, with own minimizers in index: {len(present)}")
    cov = taxon_coverage_stats(idx)
    print(
        f"Total minimizers {cov['total_minimizers']}, at leaf taxa "
        f"{cov['leaf_minimizers']} ({100 * cov['leaf_fraction']:.2f}%)"
    )


def write_inspect_reports(idx, output: str, labels: Optional[str] = None, library=None):
    """Kraken-style quasi reports describing the index
    (KeyValueIndex.scala:274-306):
      <out>_min_report.txt     index contents in minimizers
      <out>_genome_report.txt  stored taxa (count 1 each)
      <out>_missing_report.txt label taxa missing from the index
    """
    per_taxon = sorted(idx.records_per_taxon().items())
    KrakenReport(idx.taxonomy, per_taxon).write(output + "_min_report.txt")
    KrakenReport(idx.taxonomy, [(t, 1) for t, _ in per_taxon]).write(
        output + "_genome_report.txt"
    )
    if labels:
        label_taxa = set()
        with open(labels) as f:
            for line in f:
                parts = line.rstrip("\n").split("\t")
                if len(parts) >= 2:
                    label_taxa.add(int(parts[1]))
        present = {t for t, _ in per_taxon}
        missing = sorted(label_taxa - present)
        KrakenReport(idx.taxonomy, [(t, 1) for t in missing]).write(
            output + "_missing_report.txt"
        )
