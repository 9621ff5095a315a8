#!/usr/bin/env python3
"""Generate deterministic IMGT/EMBL flat-file fixtures (FIXTURES.md §1).

Writes src/main/resources/graft/hla.3560.dat and hla.3570.dat: small,
hand-traceable releases exercising every build path — full 17-feature
HLA-A shape, shared feature sequences (accession dedup), a blocklisted
allele, a too-short sequence, a CDS-less record (error path), an
unknown locus, and cross-release stability (identical + new alleles).

Run once; output is committed. Deterministic (no randomness).
"""
import os, textwrap, hashlib

OUT = os.path.join(os.path.dirname(__file__), "..", "src/main/resources/graft")

BASES = "ACGT"

def seq_for(tag, length):
    """Deterministic pseudo-sequence: md5-keystream over the tag."""
    out = []
    block = 0
    while len(out) < length:
        d = hashlib.md5(f"{tag}#{block}".encode()).digest()
        out.extend(BASES[b % 4] for b in d)
        block += 1
    return "".join(out[:length])

def hash_byte(tag, i):
    return hashlib.md5(f"{tag}#{i}".encode()).digest()[0]

# 17-feature structure: 5'UTR, exon1..8 interleaved intron1..7, 3'UTR.
STRUCTURE = (["utr5"] +
             [x for r in range(1, 8) for x in (f"exon{r}", f"intron{r}")] +
             ["exon8", "utr3"])
LENS = {"utr5": 30, "utr3": 24}
for r in range(1, 9):
    LENS[f"exon{r}"] = 18 + 3 * (r % 3)
for r in range(1, 8):
    LENS[f"intron{r}"] = 12 + 3 * (r % 2)

def make_allele(acc, name, variants, skip_cds=False):
    """variants: dict position->variant tag (default 'v0' per locus)."""
    locus = name.split("*")[0]
    feats, pos, seq_parts = [], 1, []
    coords = {}
    for p in STRUCTURE:
        tag = f"{locus}|{p}|{variants.get(p, 'v0')}"
        s = seq_for(tag, LENS[p])
        coords[p] = (pos, pos + len(s) - 1)
        seq_parts.append(s)
        pos += len(s)
    full = "".join(seq_parts)
    lines = [f"ID   {acc}; SV 1; standard; DNA; HUM; {len(full)} BP.",
             "XX",
             f"AC   {acc};",
             "XX",
             f"DE   {name}, Human MHC sequence",
             "XX",
             "KW   HLA; MHC;",
             "XX",
             f"FT   source          1..{len(full)}",
             'FT                   /organism="Homo sapiens"']
    a, b = coords["utr5"]
    lines.append(f"FT   UTR             {a}..{b}")
    for r in range(1, 9):
        a, b = coords[f"exon{r}"]
        lines.append(f"FT   exon            {a}..{b}")
        lines.append(f'FT                   /number="{r}"')
        if r < 8:
            a, b = coords[f"intron{r}"]
            lines.append(f"FT   intron          {a}..{b}")
            lines.append(f'FT                   /number="{r}"')
    if not skip_cds:
        segs = ",".join(f"{coords[f'exon{r}'][0]}..{coords[f'exon{r}'][1]}"
                        for r in range(1, 9))
        loc = f"join({segs})"
        first = f"FT   CDS             {loc[:46]}"
        rest = loc[46:]
        lines.append(first)
        while rest:
            lines.append("FT                   " + rest[:46])
            rest = rest[46:]
        cds_len = sum(coords[f"exon{r}"][1] - coords[f"exon{r}"][0] + 1
                      for r in range(1, 9))
        aa = "M" + "".join("ARNDCQEGHILKMFPSTWYV"[hash_byte(name, i) % 20]
                           for i in range(cds_len // 3 - 1))
        tr = f'/translation="{aa}"'
        lines.append("FT                   " + tr[:46])
        t = tr[46:]
        while t:
            lines.append("FT                   " + t[:46])
            t = t[46:]
    a, b = coords["utr3"]
    lines.append(f"FT   UTR             {a}..{b}")
    lines.append(f"SQ   Sequence {len(full)} BP; 0 A; 0 C; 0 G; 0 T; 0 other;")
    for i in range(0, len(full), 60):
        chunk = full[i:i + 60].lower()
        grouped = " ".join(textwrap.wrap(chunk, 10))
        lines.append(f"     {grouped:<66}{min(i + 60, len(full))}")
    lines.append("//")
    return "\n".join(lines)

def make_tiny(acc, name, seq):
    return "\n".join([
        f"ID   {acc}; SV 1; standard; DNA; HUM; {len(seq)} BP.",
        f"DE   {name}, Human MHC sequence",
        f"FT   source          1..{len(seq)}",
        f"SQ   Sequence {len(seq)} BP; 0 A; 0 C; 0 G; 0 T; 0 other;",
        f"     {seq.lower():<66}{len(seq)}",
        "//"])

R3560 = [
    make_allele("HLA00001", "HLA-A*01:01:01:01", {}),
    make_allele("HLA00002", "HLA-A*01:01:01:02", {"utr5": "v1"}),
    make_allele("HLA00003", "HLA-A*01:02", {"exon2": "v1", "exon3": "v1"}),
    make_allele("HLA00004", "HLA-A*02:01",
                {p: "v2" for p in STRUCTURE if p.startswith("exon")}),
    make_allele("HLA00005", "HLA-B*07:02", {}),
    make_allele("HLA00006", "HLA-B*08:01", {"exon2": "v1"}),
    make_allele("HLA00007", "HLA-C*01:02", {}),
    make_allele("HLA00008", "HLA-DRB5*01:01:01", {}),
    make_allele("HLA00009", "HLA-C*05:206", {"exon4": "v1"}),   # blocklisted
    make_tiny("HLA00010", "HLA-A*99:99", "ACGT"),               # too short
    make_allele("HLA00011", "HLA-A*03:01", {"exon5": "v1"}, skip_cds=True),
    make_allele("HLA00012", "ZZZ*01:01", {}),                   # unknown locus
]

R3570 = [
    make_allele("HLA00001", "HLA-A*01:01:01:01", {}),           # unchanged
    make_allele("HLA00002", "HLA-A*01:01:01:02", {"utr5": "v1"}),
    make_allele("HLA00013", "HLA-A*01:03", {"exon1": "v9"}),    # new variant
    make_allele("HLA00014", "HLA-B*15:01", {"exon2": "v2", "intron3": "v1"}),
]

os.makedirs(OUT, exist_ok=True)
for rel, records in (("3560", R3560), ("3570", R3570)):
    path = os.path.join(OUT, f"hla.{rel}.dat")
    with open(path, "w") as f:
        f.write("\n".join(records) + "\n")
    print(f"wrote {path} ({len(records)} records)")
