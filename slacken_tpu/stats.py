"""Index statistics and inspection reports (reference: IndexStatistics.scala,
KeyValueIndex.report/kmerDepthHistogram, KeyValueIndex.scala:240-344)."""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from .report import KrakenReport
from .taxonomy import depth_to_title


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
    """Per-taxon minimizer coverage of library taxa in the index
    (showTaxonFullCoverageStats, IndexStatistics.scala:86-111)."""
    per_taxon = idx.records_per_taxon()
    lib_taxa = sorted({t for t in library.labels.values()})
    present = [t for t in lib_taxa if per_taxon.get(t, 0) > 0]
    print(f"Library taxa: {len(lib_taxa)}, with own minimizers in index: {len(present)}")
    cov = taxon_coverage_stats(idx)
    print(
        f"Total minimizers {cov['total_minimizers']}, at leaf taxa "
        f"{cov['leaf_minimizers']} ({100 * cov['leaf_fraction']:.2f}%)"
    )
    rows = taxon_full_coverage_stats(idx, library)
    print("taxon\tminimizerCoverage\tdistinctMinimizerCoverage")
    for taxon, covs, dcovs in rows:
        print(f"{taxon}\t{covs}\t{dcovs}")


def write_inspect_reports(idx, output: str, labels: Optional[str] = None, library=None):
    """Kraken-style quasi reports describing the index
    (KeyValueIndex.scala:274-306):
      <out>_min_report.txt     index contents in minimizers
      <out>_genome_report.txt  stored taxa (count 1 each)
      <out>_missing_report.txt label taxa missing from the index
    With a genome library, the minimizer report gains TKC1/2/3 k-mer count
    columns (KeyValueIndex.scala:279-284).
    """
    per_taxon = sorted(idx.records_per_taxon().items())
    if library is not None:
        total_kmer_count_report(idx, library).write(output + "_min_report.txt")
    else:
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


# ---------------------------------------------------------------------------
# Total k-mer count report (reference: IndexStatistics.scala:38-52, 114-222)
# ---------------------------------------------------------------------------

from functools import partial as _partial

import jax as _jax
from .ops import encode as _encode
from .ops import lookup as _lookup_ops
from .ops.minimizers import window_minimizers as _window_minimizers


@_partial(_jax.jit, static_argnums=(1,))
def _library_scan_kernel(codes, mp, lut=None):
    wm = _window_minimizers(codes, mp, lut)
    return wm.minimizer.hi, wm.minimizer.lo, wm.span_start, wm.valid


def library_span_data(idx, library, batch_rows: int = 64, row_len: int = 1 << 16):
    """Scan the genome library: per-taxon total k-mer (valid window) counts
    and per-span minimizer keys with their source taxon."""
    import numpy as _np

    mp = idx.params.minimizer_params
    k = idx.params.k
    kmer_counts = {}
    span_keys = []
    span_taxa = []

    buf, buf_taxa = [], []

    def flush():
        if not buf:
            return
        codes, _ = _encode.pack_batch(buf, row_len)
        hi, lo, starts, valid = _library_scan_kernel(codes, mp, idx.device_lut)
        hi = _np.asarray(hi); lo = _np.asarray(lo)
        starts = _np.asarray(starts); valid = _np.asarray(valid)
        taxa_arr = _np.array(buf_taxa, _np.int32)
        per_row = valid.sum(axis=1)
        for t in _np.unique(taxa_arr):
            kmer_counts[int(t)] = kmer_counts.get(int(t), 0) + int(per_row[taxa_arr == t].sum())
        rows, cols = _np.nonzero(starts)
        keys = (hi[rows, cols].astype(_np.uint64) << _np.uint64(32)) | lo[rows, cols]
        span_keys.append(keys)
        span_taxa.append(taxa_arr[rows])
        buf.clear(); buf_taxa.clear()

    step = row_len - (k - 1)
    for taxon, _, seq in library.sequences():
        codes = _encode.encode_seq(seq)
        for off in range(0, max(len(codes) - k + 1, 1), step):
            buf.append(codes[off : off + row_len])
            buf_taxa.append(taxon)
            if len(buf) >= batch_rows:
                flush()
    flush()
    if span_keys:
        keys = _np.concatenate(span_keys)
        taxa = _np.concatenate(span_taxa)
    else:
        keys = _np.zeros(0, _np.uint64); taxa = _np.zeros(0, _np.int32)
    return kmer_counts, keys, taxa


class TotalKmerSizeAggregator:
    """Clade-averaged genome k-mer sizes, three strategies
    (TotalKmerSizeAggregator, IndexStatistics.scala:130-222)."""

    def __init__(self, taxonomy, genome_sizes: dict):
        self.tax = taxonomy
        self.sizes = dict(genome_sizes)
        # (sum of leaf-accessible genome sizes, genome count) per taxon
        self.tree = {}
        self._compute(1)

    def _compute(self, root):
        # iterative post-order DFS
        stack = [(root, False)]
        while stack:
            taxon, done = stack.pop()
            if not done:
                stack.append((taxon, True))
                for c in self.tax.children[taxon]:
                    stack.append((c, False))
            else:
                s, n = (self.sizes.get(taxon, 0), 1 if taxon in self.sizes else 0)
                for c in self.tax.children[taxon]:
                    cs, cn = self.tree[c]
                    s += cs
                    n += cn
                self.tree[taxon] = (s, n)

    def s1(self, taxon) -> float:
        """Average over all leaf genomes in the clade (TKC1-LeafOnly)."""
        children = self.tax.children[taxon]
        if children:
            s = sum(self.tree[c][0] for c in children)
            n = sum(self.tree[c][1] for c in children)
        else:
            s, n = self.tree.get(taxon, (0, 0))
        if taxon in self.sizes and children:
            s += self.sizes[taxon]
            n += 1
        return s / n if n else 0.0

    def s2(self, taxon) -> float:
        """Average of immediate children's averages (TKC2-FirstChildren)."""
        children = self.tax.children[taxon]
        if children:
            vals = [
                self.tree[c][0] / self.tree[c][1]
                for c in children
                if self.tree[c][1] > 0
            ]
            if taxon in self.sizes:
                vals = [float(self.sizes[taxon])] + vals
            return sum(vals) / len(vals) if vals else 0.0
        s, n = self.tree.get(taxon, (0, 0))
        return s / n if n else 0.0

    def s3(self, taxon) -> float:
        """Weighted mix of S1 and S2 (TKC3-AllChildren)."""
        children_nz = [
            self.tree[c] for c in self.tax.children[taxon] if self.tree[c][1] > 0
        ]
        if children_nz:
            s = sum(x[0] for x in children_nz)
            n = sum(x[1] for x in children_nz)
        else:
            s, n = self.tree.get(taxon, (0, 0))
        m = len(children_nz)
        if n + m == 0:
            return 0.0
        return (self.s1(taxon) * n + self.s2(taxon) * m) / (n + m)


class TotalKmerCountReport(KrakenReport):
    """KrakenReport with TKC1/2/3 clade-average columns
    (TotalKmerCountReport, IndexStatistics.scala:114-128)."""

    HEADERS = KrakenReport.HEADERS.replace(
        "#Perc\tAggregate\tIn taxon",
        "#Perc\tAggregate\tIn taxon\tTKC1-LeafOnly\tTKC2-FirstChildren\tTKC3-AllChildren",
    )

    def __init__(self, taxonomy, counts, genome_sizes: dict):
        super().__init__(taxonomy, counts)
        self.agg = TotalKmerSizeAggregator(taxonomy, genome_sizes)

    def _data_columns(self, taxid):
        base = super()._data_columns(taxid)
        s1 = round(self.agg.s1(taxid))
        s2 = round(self.agg.s2(taxid))
        s3 = round(self.agg.s3(taxid))
        return f"{base}\t{s1}\t{s2}\t{s3}"


def total_kmer_count_report(idx, library) -> TotalKmerCountReport:
    """Per-taxon minimizer counts + genome k-mer size averages
    (IndexStatistics.totalKmerCountReport, IndexStatistics.scala:38-52)."""
    kmer_counts, _, _ = library_span_data(idx, library)
    per_taxon = sorted(idx.records_per_taxon().items())
    return TotalKmerCountReport(idx.taxonomy, per_taxon, kmer_counts)


def taxon_full_coverage_stats(idx, library):
    """For each library taxon: minimizer counts (total and distinct) grouped
    by the depth of each minimizer's index LCA, as 'depth:count|...' strings
    (showTaxonFullCoverageStats, IndexStatistics.scala:86-111)."""
    import numpy as _np

    _, keys, taxa = library_span_data(idx, library)
    if len(keys) == 0:
        return []
    # count (minimizer, taxon) multiplicities
    order = _np.lexsort((keys, taxa))
    keys, taxa = keys[order], taxa[order]
    newpair = _np.empty(len(keys), bool)
    newpair[0] = True
    newpair[1:] = (keys[1:] != keys[:-1]) | (taxa[1:] != taxa[:-1])
    u_keys, u_taxa = keys[newpair], taxa[newpair]
    count_all = _np.diff(_np.append(_np.flatnonzero(newpair), len(keys)))

    qk = _lookup_ops.keys_from_numpy(u_keys)
    lca = _np.asarray(idx.lookup(qk.hi, qk.lo))
    found = lca > 0
    depth = idx.taxonomy.depth_std[lca[found]].astype(int)
    t_found = u_taxa[found]
    ca = count_all[found]

    out = {}
    for taxon in _np.unique(t_found):
        sel = t_found == taxon
        rows = {}
        for d, c in zip(depth[sel], ca[sel]):
            a, b = rows.get(int(d), (0, 0))
            rows[int(d)] = (a + int(c), b + 1)
        covs = "|".join(f"{d}:{rows[d][0]}" for d in rows)
        dcovs = "|".join(f"{d}:{rows[d][1]}" for d in rows)
        out[int(taxon)] = (covs, dcovs)
    return [(t, c, d) for t, (c, d) in sorted(out.items())]
