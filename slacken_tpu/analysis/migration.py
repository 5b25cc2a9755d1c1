"""Index-vs-index minimizer migration comparison
(reference: analysis/MinimizerMigration.scala): join two indexes on
minimizer and histogram how far each LCA moved up the tree."""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..report import KrakenReport
from ..taxonomy import ROOT

CELLULAR_ORGANISMS = 131567  # MinimizerMigration.scala:76


class MinimizerMigration:
    def __init__(self, index, reference):
        self.index = index
        self.reference = reference

    def taxa_distances(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(taxon in index, taxon in reference, steps moved up) for shared
        minimizers. Sorted-array intersection replaces the Spark join."""
        k1, t1 = self.index.keys, self.index.taxa
        k2, t2 = self.reference.keys, self.reference.taxa
        common, i1, i2 = np.intersect1d(k1, k2, return_indices=True)
        a = np.asarray(t1)[i1]
        b = np.asarray(t2)[i2]
        depth = self.reference.taxonomy.depth_std
        d1 = depth[a].astype(np.int32)
        d2 = depth[b].astype(np.int32)
        steps = np.where(d1 == -1, -100, np.where(d2 == -1, -200, d1 - d2))
        return a, b, steps

    def run(self, output: str):
        a, b, steps = self.taxa_distances()
        hist: Dict[int, int] = {}
        for s, c in zip(*np.unique(steps, return_counts=True)):
            hist[int(s)] = int(c)
        print("steps\tcount")
        for s in sorted(hist):
            print(f"{s}\t{hist[s]}")

        # records that migrated to ROOT/cellular organisms ("almost nothing
        # known") in the reference — MinimizerMigration.scala:74-84
        to_root = (np.isin(b, [ROOT, CELLULAR_ORGANISMS])) & ~np.isin(
            a, [ROOT, CELLULAR_ORGANISMS]
        )
        vals, counts = np.unique(a[to_root], return_counts=True)
        report = KrakenReport(
            self.index.taxonomy, [(int(v), int(c)) for v, c in zip(vals, counts)]
        )
        report.write(output + "_taxaToRoot_report.txt")
        return hist
