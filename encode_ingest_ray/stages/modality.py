"""Assay-term → data-modality classification (the ~100-arm lookup).

Reference: ``AssayActivityTransformations.transformAssayTermToDataModality``
(/root/reference/transformation/src/main/scala/org/broadinstitute/monster/
encode/transformation/AssayActivityTransformations.scala:56-164).  Unknown
terms map to ``"!" + term`` (the reference's searchable sentinel).

Vectorized: the column is dictionary-encoded and the Python dict lookup runs
once per UNIQUE term, then codes broadcast back — no per-row work.
"""

from __future__ import annotations

import pyarrow as pa

ASSAY_TERM_TO_MODALITY: dict[str, str] = {
    "3' RACE": "Transcriptomic",
    "4C": "Epigenomic_3D Contact Maps",
    "5' RACE": "Transcriptomic",
    "5' RLM RACE": "Transcriptomic",
    "5C": "Epigenomic_3D Contact Maps",
    "ATAC-seq": "Epigenomic_DNAChromatinAccessibility",
    "Bru-seq": "Transcriptomic_NonTargeted",
    "BruChase-seq": "Transcriptomic_NonTargeted",
    "BruUV-seq": "Transcriptomic_NonTargeted",
    "CAGE": "Transcriptomic_NonTargeted",
    "capture Hi-C": "Epigenomic_3D Contact Maps",
    "ChIA-PET": "Epigenomic_3D Contact Maps",
    "ChIP-seq": "Epigenomic_DNABinding",
    "Circulome-seq": "Genomic",
    "Clone-seq": "Proteomic",
    "comparative genomic hybridization by array": "Genomic_Genotyping",
    "Control ChIP-seq": "Epigenomic_DNABinding",
    "Control eCLIP": "Epigenomic_RNABinding",
    "CRISPR RNA-seq": "Transcriptomic_NonTargeted",
    "CRISPR genome editing followed by RNA-seq": "Transcriptomic_NonTargeted",
    "CRISPRi RNA-seq": "Transcriptomic_NonTargeted",
    "CRISPRi followed by RNA-seq": "Transcriptomic_NonTargeted",
    "CUT&RUN": "Epigenomic_DNABinding",
    "CUT&Tag": "Epigenomic_DNABinding",
    "direct RNA-seq": "Transcriptomic_NonTargeted",
    "DNAme array": "Epigenomic_DNAMethylation",
    "DNA methylation profiling by array assay": "Epigenomic_DNAMethylation",
    "DNA-PET": "Genomic_Genotyping",
    "DNase-seq": "Epigenomic_DNAChromatinAccessibility",
    "eCLIP": "Epigenomic_RNABinding",
    "FACS CRISPR screen": "!FACS CRISPR screen",
    "FAIRE-seq": "Epigenomic_DNAChromatinAccessibility",
    "Flow-FISH CRISPR screen": "!Flow-FISH CRISPR screen",
    "GM DNase-seq": "Epigenomic_DNAChromatinAccessibility",
    "genetic modification followed by DNase-seq": "Epigenomic_DNAChromatinAccessibility",
    "genotype phasing by HiC": "Genomic_Assembly",
    "GRO-cap": "Transcriptomic_NonTargeted",
    "GRO-seq": "Transcriptomic_NonTargeted",
    "genotyping array": "Genomic_Genotyping",
    "genotyping HTS": "Genomic_Genotyping_Whole Genomic",
    "Hi-C": "Epigenomic_3D Contact Maps",
    "HiC": "Epigenomic_3D Contact Maps",
    "Histone ChIP-seq": "Epigenomic_DNABinding",
    "iCLIP": "Epigenomic_RNABinding",
    "icLASER": "Epigenomic_RNAStructure",
    "icSHAPE": "Epigenomic_RNAStructure",
    "LC/MS label-free quantitative proteomics": "Proteomic",
    "LC-MS/MS isobaric label quantitative proteomics": "Proteomic",
    "long read RNA-seq": "Transcriptomic_NonTargeted",
    "long read single-cell RNA-seq": "Transcriptomic_NonTargeted",
    "MeDIP-seq": "Epigenomic_DNAMethylation",
    "microRNA counts": "Transcriptomic_NonTargeted",
    "microRNA-seq": "Transcriptomic_NonTargeted",
    "Mint-ChIP-seq": "Epigenomic_DNABinding",
    "MNase-seq": "Epigenomic_DNAChromatinAccessibility",
    "MPRA": "Massively parallel reporter assay",
    "MRE-seq": "Epigenomic_DNAMethylation",
    "PAS-seq": "Transcriptomic_NonTargeted",
    "perturbation followed by scRNA-seq": "!perturbation followed by scRNA-seq",
    "perturbation followed by snATAC-seq": "!perturbation followed by snATAC-seq",
    "PLAC-seq": "Epigenomic_DNAChromatinAccessibility",
    "pooled clone sequencing": "Library Preparation",
    "polyA minus RNA-seq": "Transcriptomic_NonTargeted",
    "polyA plus RNA-seq": "Transcriptomic_NonTargeted",
    "PRO-cap": "Transcriptomic",
    "PRO-seq": "Transcriptomic",
    "proliferation CRISPR screen": "!proliferation CRISPR screen",
    "MS-MS": "Proteomic",
    "protein sequencing by tandem mass spectrometry assay": "Proteomic",
    "RAMPAGE": "Transcriptomic_NonTargeted",
    "Repli-chip": "Genomic",
    "Repli-seq": "Genomic",
    "Ribo-seq": "Proteomic",
    "RIP-chip": "Epigenomic_RNABinding",
    "RIP-seq": "Epigenomic_RNABinding",
    "RNA Bind-n-Seq": "Epigenomic_RNABinding",
    "RNA microarray": "Transcriptomic_Targeted",
    "RNA-PET": "Transcriptomic_NonTargeted",
    "RNA-seq": "Transcriptomic_NonTargeted",
    "RRBS": "Epigenomic_DNAMethylation",
    "shRNA RNA-seq": "Transcriptomic_NonTargeted",
    "shRNA knockdown followed by RNA-seq": "Transcriptomic_NonTargeted",
    "scRNA-seq": "Transcriptomic_NonTargeted",
    "single-cell RNA sequencing assay": "Transcriptomic_NonTargeted",
    "single-cell ATAC-seq": "Epigenomic_DNAChromatinAccessibility",
    "snATAC-seq": "Epigenomic_DNAChromatinAccessibility",
    "single-nucleus ATAC-seq": "Epigenomic_DNAChromatinAccessibility",
    "siRNA RNA-seq": "Transcriptomic_NonTargeted",
    "siRNA knockdown followed by RNA-seq": "Transcriptomic_NonTargeted",
    "small RNA-seq": "Transcriptomic_NonTargeted",
    "SPRITE": "Epigenomic_3D Contact Maps",
    "SPRITE-IP": "Epigenomic_3D Contact Maps",
    "STARR-seq": "Massively parallel reporter assay",
    "Switchgear": "Epigenomic_RNABinding",
    "TAB-seq": "Epigenomic_DNAMethylation",
    "TF ChIP-seq": "Epigenomic_DNABinding_TranscriptomeFactorLocation",
    "total RNA-seq": "Transcriptomic_NonTargeted",
    "transcription profiling by array assay": "Transcriptomic_NonTargeted",
    "WGS": "Genomic_Genotyping_Whole Genomic",
    "whole genome sequencing assay": "Genomic_Genotyping_Whole Genomic",
    "WGBS": "Epigenomic_DNAMethylation",
    "whole-genome shotgun bisulfite sequencing": "Epigenomic_DNAMethylation",
}


def assay_term_to_modality(term: str | None) -> str | None:
    """Scalar form: the reference's catch-all maps unknowns to '!'+term."""
    if term is None:
        return None
    return ASSAY_TERM_TO_MODALITY.get(term, "!" + term)


def modality_lookup(batch: pa.Table, column: str, out: str) -> pa.Table:
    """Vectorized column form: dict-encode, translate uniques, broadcast."""
    col = batch.column(column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = col.dictionary_encode()
    uniq = [assay_term_to_modality(u) for u in d.dictionary.to_pylist()]
    # reuse the (null-preserving) index vector, swap the dictionary
    translated = pa.DictionaryArray.from_arrays(
        d.indices, pa.array(uniq, pa.string())
    ).cast(pa.string())
    return batch.append_column(out, translated)
