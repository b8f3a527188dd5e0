"""Vectorized text-page layout kernel (implements kernel/SPEC.md).

This is what Spark executes inside ``mapInPandas``: per Arrow batch,
all character-level work (line classification, binarization, ink
profiles) is done with pandas/numpy vectorized string ops across the
*flattened line array of the whole batch*; only the cheap per-page
region assembly (a state machine over a few dozen line labels) runs as
Python, mirroring how the reference iterates over per-page contour
lists after vectorized numpy/OpenCV passes.

Reference parity (all citations into /root/reference/qurator/eynollah):
- two-model classification + binarized-retry gate: eynollah.py:1148-1379
- patch-wise inference with overlap-margin stitching (do_prediction):
  eynollah.py:522-639 -> ``LineModel.classify_patched``
- page border extraction: eynollah.py:673-710
- column split (find_num_col): utils/__init__.py:363-532
- reading order (order_of_regions): utils/__init__.py:993-1156
- drop-capital adherence: utils/drop_capitals.py:9-347
- small-textline adherence: utils/__init__.py:860-991
- deskew slope (fitLine): utils/__init__.py:331-332
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from eynollah_spark.config import (
    DEFAULT_CONFIG,
    RT_TABLE,
    ExtractConfig,
    FOOTER_PREFIXES,
    RT_DROPCAP,
    RT_HEADER,
    RT_MARGINALIA,
    RT_SEPARATOR,
    RT_TEXT,
    RT_TOOL,
    SEP_CHARS,
)

# blocks longer than this bypass the vectorized int64 LS-slope gate
# and use Python's exact integer arithmetic instead. B_e = cn*sk2 -
# sk^2 ~ cn^4/12 wraps int64 at cn ~ (12*2^63)^(1/4) ~ 102,570; 2^16
# leaves a ~2^10 margin that also covers A_e's extra indent factor
_LS_GATE_MAX_LINES = 1 << 16

# integer line classes (pixel-code analog, eynollah.py:1269-1282)
C_BLANK, C_SEP, C_MARG, C_HEADER, C_DROPCAP, C_TEXT = 0, 1, 2, 3, 4, 5
# assigned outside the classifier:
C_FENCE, C_TOOL = 6, 7
# table row (M10 analog; only produced when cfg.enable_tables)
C_TABLE = 8

_SEP_RE = "^[" + re.escape("".join(sorted(SEP_CHARS))) + "]{3,}$"
_HEADER_RE = r"^(?:#{1,6} |[A-Z][A-Z0-9_]{2,11}:)"
_NONASCII_RE = r"[^\x00-\x7f]"


class LineModel:
    """The broadcastable 'model weights' for line classification.

    Stand-in for the reference's CNN ensemble (M4/M5,
    eynollah.py:140-141): a deterministic rule model whose parameters
    (regexes + thresholds) are broadcast once via ``sc.broadcast`` and
    applied to whole Arrow batches — the north-rule requirement that
    weights are shipped once per executor, not per task closure.
    """

    # how many neighboring lines influence one line's label. The rule
    # head is per-line (0); a contextual model (e.g. a CNN over a line
    # window) would set its receptive-field half-width here, and the
    # patch harness guarantees margin >= context so stitching is exact.
    context_window: int = 0

    def __init__(self, cfg: ExtractConfig = DEFAULT_CONFIG):
        self.cfg = cfg

    # --- model A / model B shared rule head -------------------------------
    def classify_stripped(self, stripped: pd.Series) -> np.ndarray:
        """Vectorized SPEC §4 rules over a Series of stripped lines."""
        cfg = self.cfg
        n = len(stripped)
        out = np.full(n, C_TEXT, dtype=np.int8)
        slen = stripped.str.len().to_numpy()

        blank = slen == 0
        sep = stripped.str.match(_SEP_RE, na=False).to_numpy()
        marg = (
            stripped.str.startswith("[note:", na=False)
            & stripped.str.endswith("]", na=False)
        ).to_numpy()
        header = (
            stripped.str.match(_HEADER_RE, na=False).to_numpy()
            & (slen <= cfg.header_max_len)
        )
        first = stripped.str.slice(0, 1)
        dropcap = (slen == 1) & (first >= "A").to_numpy() & (first <= "Z").to_numpy()

        # first-match-wins precedence, applied in reverse priority;
        # header/dropcap only exist in full-layout mode (the M6/M7
        # second-model pass, eynollah.py:1837)
        if cfg.enable_tables:
            table = stripped.str.count(r"\|").to_numpy() >= cfg.table_min_pipes
            out[table] = C_TABLE
        if cfg.full_layout:
            out[dropcap] = C_DROPCAP
            out[header] = C_HEADER
        out[marg] = C_MARG
        out[sep] = C_SEP
        out[blank] = C_BLANK
        return out

    def classify_arrow(self, stripped_pa, s_len: np.ndarray) -> np.ndarray:
        """Arrow fast path of the rule head: same rules as
        ``classify_stripped`` evaluated with pyarrow.compute (RE2) over
        contiguous buffers. Pattern set is RE2-compatible and anchored,
        so it is semantics-identical to the Python-re path (the fuzz
        suite exercises both against the oracle)."""
        import pyarrow.compute as pc

        cfg = self.cfg
        n = len(s_len)
        out = np.full(n, C_TEXT, dtype=np.int8)
        blank = s_len == 0
        sep = pc.match_substring_regex(stripped_pa, _SEP_RE).to_numpy(
            zero_copy_only=False
        ).astype(bool)
        marg = (
            pc.starts_with(stripped_pa, "[note:").to_numpy(zero_copy_only=False)
            & pc.ends_with(stripped_pa, "]").to_numpy(zero_copy_only=False)
        ).astype(bool)
        header = pc.match_substring_regex(stripped_pa, _HEADER_RE).to_numpy(
            zero_copy_only=False
        ).astype(bool) & (s_len <= cfg.header_max_len)
        first = pc.utf8_slice_codeunits(stripped_pa, 0, 1)
        dropcap = (
            (s_len == 1)
            & pc.greater_equal(first, "A").to_numpy(zero_copy_only=False).astype(bool)
            & pc.less_equal(first, "Z").to_numpy(zero_copy_only=False).astype(bool)
        )
        if cfg.enable_tables:
            table = (
                pc.count_substring(stripped_pa, "|")
                .to_numpy()
                .astype(np.int64)
                >= cfg.table_min_pipes
            )
            out[table] = C_TABLE
        if cfg.full_layout:
            out[dropcap] = C_DROPCAP
            out[header] = C_HEADER
        out[marg] = C_MARG
        out[sep] = C_SEP
        out[blank] = C_BLANK
        return out

    def classify_patched(self, stripped: pd.Series) -> np.ndarray:
        """Patch-wise application with overlap-margin stitching — the
        do_prediction graft (eynollah.py:522-639): the line array is
        tiled into patches of ``patch_lines`` with ``patch_margin``
        overlap on each side; only each patch's interior is written to
        the output (first/last patches keep their outer edge, the 9-case
        interior rule at eynollah.py:590-634 collapsed to 1-D)."""
        cfg = self.cfg
        n = len(stripped)
        step = cfg.patch_lines - 2 * cfg.patch_margin
        if n <= cfg.patch_lines or step <= 0:
            return self.classify_stripped(stripped)
        if self.context_window == 0:
            # per-line model: interior-stitched patch output is exactly
            # the whole-array prediction (margin writes are identity),
            # so run the vectorized head once instead of per patch.
            # The patch loop below stays live for contextual models and
            # is equivalence-tested in tests/test_kernel_oracle.py.
            return self.classify_stripped(stripped)
        out = np.empty(n, dtype=np.int8)
        start = 0
        while start < n:
            lo = max(0, start - cfg.patch_margin)
            hi = min(n, start + step + cfg.patch_margin)
            pred = self.classify_stripped(stripped.iloc[lo:hi])
            w_lo = start
            w_hi = min(n, start + step)
            out[w_lo:w_hi] = pred[w_lo - lo : w_hi - lo]
            start += step
        return out


# Every code point Python's str.strip()/str.isspace() treats as
# whitespace — passed to Arrow's utf8_trim so the Arrow fast path has
# BIT-EXACT parity with the oracle's Python .strip() (Arrow's
# utf8_trim_whitespace uses the Unicode White_Space property, which
# differs on \x1c-\x1f etc.).
_PY_WHITESPACE = "".join(chr(c) for c in range(0x3001) if chr(c).isspace())
# boolean LUT over the same range for grid-side .strip() parity
# (0x3000 IDEOGRAPHIC SPACE is Unicode's highest whitespace codepoint,
# so clamping larger codepoints to index 0 — NUL, not whitespace — is
# exact); used by the batched column-span trim in _emit_cols
_WS_LUT = np.zeros(0x3001, dtype=bool)
_WS_LUT[[ord(c) for c in _PY_WHITESPACE]] = True


def _flatten_lines_arrow(texts: pd.Series):
    """Split a batch of turn texts into one flat Arrow line array.

    Returns (lines_pa: pa.StringArray (flattened), turn_ord: int64[],
    line_start: int64[], n_per: int64[]). line_start is the char
    offset of each line within its own turn text. All string traffic
    stays in Arrow contiguous buffers; no per-line Python objects are
    created here.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.array(texts.to_numpy(), type=pa.string(), from_pandas=True)
    arr = pc.coalesce(arr, pa.scalar("", type=pa.string()))
    split = pc.split_pattern(arr, "\n")
    n_per = pc.list_value_length(split).to_numpy().astype(np.int64)
    lines_pa = pc.list_flatten(split)
    turn_ord = np.repeat(np.arange(len(texts), dtype=np.int64), n_per)
    lens = pc.utf8_length(lines_pa).to_numpy().astype(np.int64)
    csum = np.cumsum(lens + 1)
    turn_first = np.zeros(len(texts), dtype=np.int64)
    if len(texts):
        turn_first[1:] = np.cumsum(n_per)[:-1]
    global_start = np.concatenate(([0], csum[:-1]))
    nonzero = n_per > 0
    base = np.repeat(global_start[turn_first[nonzero]], n_per[nonzero])
    line_start = global_start - base
    return lines_pa, turn_ord, line_start, n_per, lens


def _flatten_lines(texts: pd.Series):
    """Back-compat pandas wrapper around the Arrow flattener."""
    lines_pa, turn_ord, line_start, n_per, _ = _flatten_lines_arrow(texts)
    lines = pd.Series(lines_pa.to_numpy(zero_copy_only=False), dtype="object")
    return lines, turn_ord, line_start, n_per


SPAN_COLUMNS = [
    "span_idx",
    "region_type",
    "region_seq",
    "char_start",
    "char_end",
    "text",
]


def _wrap_line(ln: str, width: int) -> list:
    """Greedy space-wrap of one over-long line (> width): each cut is
    the LAST space at index <= width (hard cut at width when a token
    is wider than the page); pieces are right-trimmed, the remainder
    left-trimmed, empty pieces dropped."""
    parts = []
    s = ln
    while len(s) > width:
        cut = s.rfind(" ", 1, width + 1)
        if cut == -1:
            head, s = s[:width], s[width:]
        else:
            head, s = s[:cut], s[cut + 1 :]
        head = head.rstrip(" ")
        s = s.lstrip(" ")
        if head:
            parts.append(head)
    if s:
        parts.append(s)
    return parts


def enhance_page_text(text: str, cfg: ExtractConfig):
    """SPEC §1e enhancement pre-pass (M1 analog, reference
    eynollah.py:381-450,1988-2010): a page whose ink density
    (len(text) / n_lines, the DPI analog) is below
    ``enhancement_density_min`` is rewritten before classification —
    lines right-trimmed, runs of blank lines collapsed to one,
    over-long lines greedily re-wrapped at spaces. Returns
    (new_text, was_enhanced); span offsets downstream refer to the
    enhanced text."""
    n_lines = text.count("\n") + 1
    if len(text) / n_lines >= cfg.enhancement_density_min:
        return text, False
    out = []
    prev_blank = False
    for ln in text.split("\n"):
        ln = ln.rstrip(" ")
        blank = ln == ""
        if blank and prev_blank:
            continue
        prev_blank = blank
        if len(ln) > cfg.enhancement_wrap_width:
            out.extend(_wrap_line(ln, cfg.enhancement_wrap_width))
        else:
            out.append(ln)
    return "\n".join(out), True


def analyze_turns_batch(
    pdf: pd.DataFrame, model: LineModel | None = None
) -> pd.DataFrame:
    """Batch kernel: pdf has columns (conv_id, turn_idx, role, text);
    returns (conv_id, turn_idx, span_idx, region_type, region_seq,
    char_start, char_end, text)."""
    return _analyze_batch(pdf, model, want_diag=False)


def page_diags_batch(
    pdf: pd.DataFrame, model: LineModel | None = None
) -> pd.DataFrame:
    """Per-page diagnostics (SPEC §11)."""
    return _analyze_batch(pdf, model, want_diag=True)


def analyze_turns_frames(
    pdf: pd.DataFrame, model: LineModel | None = None
) -> list[pd.DataFrame]:
    """Iterator-friendly twin of ``analyze_turns_batch``: returns the
    fast-path and slow-path frames as a LIST (0-2 entries) instead of
    concatenating them — mapInPandas yields each directly, skipping
    the pandas block consolidation that concat forces. Row order
    across the frames is NOT part of the contract (extract.py imposes
    the conversation windows downstream)."""
    return _analyze_batch(pdf, model, want_diag=False, as_frames=True)


def _analyze_batch(
    pdf: pd.DataFrame, model, want_diag: bool, as_frames: bool = False
):
    if model is None:
        model = LineModel()
    cfg = model.cfg
    import pyarrow.compute as pc

    texts = pdf["text"].astype("object").fillna("")
    roles = pdf["role"].to_numpy()

    # §1e enhancement pre-pass (gated; M1 analog): flagged low-density
    # non-tool pages are rewritten before the line flatten, so every
    # downstream feature/offset sees the enhanced text. The gate is
    # vectorized; the rewrite itself runs only on the flagged subset.
    was_enh = np.zeros(len(pdf), dtype=bool)
    if cfg.enable_enhancement and len(pdf):
        nl = texts.str.count("\n").to_numpy() + 1
        nc = texts.str.len().to_numpy()
        flag = ((nc / nl) < cfg.enhancement_density_min) & (roles != "tool")
        if flag.any():
            tv = texts.to_numpy(copy=True)
            for i in np.flatnonzero(flag):
                tv[i], e = enhance_page_text(tv[i], cfg)
                was_enh[i] = e
            texts = pd.Series(tv, dtype="object")

    lines_pa, turn_ord, line_start, n_per, raw_len = _flatten_lines_arrow(texts)

    # --- Arrow-vectorized per-line features over the whole batch ---
    # (contiguous buffers + RE2; _PY_WHITESPACE keeps .strip() parity)
    stripped_pa = pc.utf8_trim(lines_pa, _PY_WHITESPACE)
    s_len = pc.utf8_length(stripped_pa).to_numpy().astype(np.int64)
    lstr_len = (
        raw_len
        - pc.utf8_length(pc.utf8_ltrim(lines_pa, _PY_WHITESPACE))
        .to_numpy()
        .astype(np.int64)
    )

    def _b(arrow_bool):
        return arrow_bool.to_numpy(zero_copy_only=False).astype(bool)

    is_banner = (
        (s_len >= 6)
        & _b(pc.starts_with(stripped_pa, "==="))
        & _b(pc.ends_with(stripped_pa, "==="))
    )
    is_footer = np.zeros(len(s_len), dtype=bool)
    for p in FOOTER_PREFIXES:
        is_footer |= _b(pc.starts_with(stripped_pa, p))
    is_fence_marker = _b(pc.starts_with(stripped_pa, "```"))

    if model.context_window == 0:
        cls_a = model.classify_arrow(stripped_pa, s_len)
        # model B: binarized retry input (eynollah.py:1230-1266).
        # Binarization only alters lines containing non-ASCII, so the
        # second pass runs on exactly those lines; the rest reuse
        # cls_a (identical input => identical per-line labels).
        cls_b = cls_a.copy()
        has_nonascii = _b(pc.match_substring_regex(lines_pa, _NONASCII_RE))
        if has_nonascii.any():
            import pyarrow as pa

            bin_sub_pa = pc.utf8_trim(
                pc.replace_substring_regex(
                    lines_pa.filter(pa.array(has_nonascii)), _NONASCII_RE, ""
                ),
                _PY_WHITESPACE,
            )
            cls_b[has_nonascii] = model.classify_arrow(
                bin_sub_pa, pc.utf8_length(bin_sub_pa).to_numpy().astype(np.int64)
            )
        stripped = None  # pandas Series not needed on the fast path
    else:
        stripped = pd.Series(
            stripped_pa.to_numpy(zero_copy_only=False), dtype="object"
        )
        lines = pd.Series(lines_pa.to_numpy(zero_copy_only=False), dtype="object")
        cls_a = model.classify_patched(stripped)
        bin_stripped = lines.str.replace(_NONASCII_RE, "", regex=True).str.strip()
        cls_b = model.classify_patched(bin_stripped)

    # --- batch-wide page assembly (segmented numpy; SPEC §§1-5) ---
    # Pages average ~13 lines, so per-page Python/numpy dispatch
    # dominates when run page-at-a-time; instead every per-LINE pass
    # (border trim, fence toggles, agreement gate, band splits, region
    # runs) runs once over the flattened batch with per-page resets,
    # and Python touches only per-REGION lists (~spans/3 items).
    span_rows = []
    diag_rows = []
    P = len(pdf)
    n = len(lines_pa)
    offsets = np.zeros(P + 1, dtype=np.int64)
    np.cumsum(n_per, out=offsets[1:])
    # materialize Python strings once, at the boundary where span text
    # objects are needed anyway
    lines_np = lines_pa.to_numpy(zero_copy_only=False)
    stripped_np = stripped_pa.to_numpy(zero_copy_only=False)
    firsts = offsets[:-1]
    tool_page = roles == "tool"

    page = np.repeat(np.arange(P, dtype=np.int64), n_per)
    rel = np.arange(n, dtype=np.int64) - np.repeat(firsts, n_per)

    # §2 border strip: first banner in the leading scan window sets lo,
    # first footer in the trailing window sets hi (<= 3 gathers each)
    lo = np.zeros(P, dtype=np.int64)
    found = np.zeros(P, dtype=bool)
    for k in range(cfg.border_scan_lines):
        valid = (k < n_per) & ~found & ~tool_page
        idx = np.minimum(firsts + k, max(n - 1, 0))
        hit = valid & (is_banner[idx] if n else False)
        lo[hit] = k + 1
        found |= hit
    hi = n_per.astype(np.int64).copy()
    foundf = np.zeros(P, dtype=bool)
    fstart = np.maximum(lo, n_per - cfg.border_scan_lines)
    for k in range(cfg.border_scan_lines):
        pos = fstart + k
        valid = (pos < n_per) & ~foundf & ~tool_page
        idx = np.minimum(firsts + pos, max(n - 1, 0))
        hit = valid & (is_footer[idx] if n else False)
        hi[hit] = pos[hit]
        foundf |= hit

    active = ~tool_page[page] & (rel >= lo[page]) & (rel < hi[page])

    # §3 fence toggle: per-page exclusive prefix parity of fence marks
    fm = is_fence_marker & active
    excl_f = np.cumsum(fm) - fm
    base_f = np.zeros(P, dtype=np.int64)
    nz = n_per > 0
    base_f[nz] = excl_f[firsts[nz]]
    in_fence_before = ((excl_f - base_f[page]) % 2).astype(bool)

    # §4 agreement gate per page
    classifiable = active & ~fm & ~in_fence_before
    n_cl = np.bincount(page[classifiable], minlength=P)
    agree = np.bincount(page[classifiable & (cls_a == cls_b)], minlength=P)
    ratio = np.where(n_cl > 0, 100.0 * agree / np.maximum(n_cl, 1), 100.0)
    used_b = ratio <= cfg.binarize_retry_threshold
    cls = np.where(used_b[page], cls_b, cls_a).astype(np.int8)
    cls[active & in_fence_before & ~fm] = C_TOOL
    cls[fm] = C_FENCE

    # §5t table-separator fusion (J5 analog, eynollah.py:1783-1817):
    # a separator line directly between two table lines joins the
    # table, so interleaved runs union and the absorbed rule line no
    # longer advances the band counter
    if cfg.enable_tables:
        is_sep_l = active & (cls == C_SEP)
        prev_tab = np.zeros(n, dtype=bool)
        next_tab = np.zeros(n, dtype=bool)
        if n > 1:
            prev_tab[1:] = (cls[:-1] == C_TABLE) & active[:-1] & (page[1:] == page[:-1])
            next_tab[:-1] = (cls[1:] == C_TABLE) & active[1:] & (page[1:] == page[:-1])
        cls[is_sep_l & prev_tab & next_tab] = C_TABLE

    # §5c blank bridging (gated; F3 closing analog,
    # utils/__init__.py:1363-1393): a SINGLE blank line between two
    # same-class run-forming lines (text/marginalia/table, same page,
    # both active) relabels to that class; candidates are computed
    # simultaneously over the original classes, so a relabel never
    # enables another
    if cfg.region_blank_bridge and n > 2:
        bl = active & (cls == C_BLANK)
        prevc = cls[:-2]
        bridgeable = (prevc == cls[2:]) & (
            (prevc == C_TEXT) | (prevc == C_MARG) | (prevc == C_TABLE)
        )
        cand = np.zeros(n, dtype=bool)
        cand[1:-1] = (
            bl[1:-1]
            & active[:-2]
            & active[2:]
            & (page[:-2] == page[2:])
            & bridgeable
        )
        if cand.any():
            ci = np.flatnonzero(cand)
            cls[ci] = cls[ci - 1]

    # §5a bands: the gap-th consecutive blank and every separator line
    # advance the band counter for LATER lines (exclusive prefix)
    blank = active & (cls == C_BLANK)
    idx_arr = np.arange(n, dtype=np.int64)
    barrier = np.where(~blank, idx_arr, -1)
    if n:
        fz = firsts[nz]
        barrier[fz] = np.where(blank[fz], fz - 1, barrier[fz])
    run_len = idx_arr - np.maximum.accumulate(barrier)
    band_event = (blank & (run_len == cfg.band_blank_gap)) | (
        active & (cls == C_SEP)
    )
    excl_b = np.cumsum(band_event) - band_event
    base_b = np.zeros(P, dtype=np.int64)
    base_b[nz] = excl_b[firsts[nz]]
    band = excl_b - base_b[page]

    # §5b region runs: maximal adjacent same-label runs of region lines;
    # header/dropcap/separator lines are singleton regions
    regline = active & (cls != C_BLANK) & (cls != C_FENCE)
    singleton = regline & (
        (cls == C_HEADER) | (cls == C_DROPCAP) | (cls == C_SEP)
    )
    prev_ok = np.zeros(n, dtype=bool)
    if n > 1:
        prev_ok[1:] = (
            (page[1:] == page[:-1])
            & regline[:-1]
            & ~singleton[:-1]
            & ~singleton[1:]
            & (cls[1:] == cls[:-1])
        )
    new_region = regline & ~prev_ok
    starts = np.flatnonzero(new_region)
    if len(starts):
        rid = np.cumsum(new_region) - 1
        counts = np.bincount(rid[regline], minlength=len(starts))
    else:
        counts = np.zeros(0, dtype=np.int64)
    r_lo = np.searchsorted(starts, offsets[:-1])
    r_hi = np.searchsorted(starts, offsets[1:])

    # §5h per-region header majority vote (J8 analog,
    # utils/__init__.py:799-858): a short TEXT region whose MODEL-B
    # (binarized — the dedicated header model analog) header-line
    # character mass reaches its text mass relabels to ONE header
    # region. Segment reductions over the region runs; the sentinel
    # pad keeps end == n a legal reduceat index.
    if len(starts) and not cfg.full_layout:
        reg_label = cls[starts]  # no-full-layout: vote disabled
    elif len(starts):
        reg_label = cls[starts]
        idx2v = np.empty(2 * len(starts), dtype=np.int64)
        idx2v[0::2] = starts
        idx2v[1::2] = starts + counts
        sentv = np.zeros(1, dtype=np.int64)
        hline = np.where(cls_b == C_HEADER, s_len, 0)
        hmass = np.add.reduceat(np.concatenate([hline, sentv]), idx2v)[0::2]
        allmass = np.add.reduceat(np.concatenate([s_len, sentv]), idx2v)[0::2]
        maxlen = np.maximum.reduceat(np.concatenate([s_len, sentv]), idx2v)[0::2]
        vote = (
            (reg_label == C_TEXT)
            & (counts <= cfg.header_vote_max_lines)
            & (maxlen <= cfg.header_max_len)
            & (hmass > 0)
            & (2 * hmass >= allmass)
        )
        reg_label[vote] = C_HEADER
    else:
        reg_label = np.zeros(0, dtype=np.int8)

    # ---- span-mode fast path: pages needing no column splits (the
    # large majority) emit entirely as numpy arrays — the §8
    # drop-capital merge and §9 fragment adherence are handled
    # array-natively in _emit_fast; only pages with actual gutter
    # splits (incl. deskewed ones) fall back to the per-page path
    # below. Tool pages are fast by construction (one pseudo-region of
    # all nonblank lines).
    fast_df = None
    if not want_diag and n and not cfg.enable_line_split:
        r_page = page[starts]
        r_label = reg_label
        complex_page = np.zeros(P, dtype=bool)
        # §6/§6d pre-check only where the page is otherwise simple;
        # the full (shifts, sheared_profile, gutters) triple is cached
        # so the per-page path never recomputes. A skewed block whose
        # shear finds NO gutters emits exactly as unsheared (SPEC §6d),
        # so it stays on the fast path — only real column structure
        # routes a page to the per-page walk.
        # note: dropcap/fragment pages (already complex) are NOT
        # excluded — caching their blocks here means the per-page
        # path never recomputes the gutter/deskew machinery
        gutter_cache: dict[int, tuple] = {}
        if len(starts):
            eligible = np.flatnonzero(
                (r_label == C_TEXT)
                & (counts >= cfg.min_block_lines)
                & ~tool_page[r_page]
            )
        else:
            eligible = np.zeros(0, dtype=np.int64)
        if len(eligible):
            st_e = starts[eligible].astype(np.int64)
            cn_e = counts[eligible].astype(np.int64)
            # segment reductions over [start, start+count) pairs; the
            # sentinel pad keeps end == n a legal reduceat index
            idx2 = np.empty(2 * len(st_e), dtype=np.int64)
            idx2[0::2] = st_e
            idx2[1::2] = st_e + cn_e
            sent = np.zeros(1, dtype=np.int64)
            wb = np.maximum.reduceat(np.concatenate([raw_len, sent]), idx2)[0::2]
            # vectorized LS-slope gate (SPEC §6d): A/B per block
            sy = np.add.reduceat(np.concatenate([lstr_len, sent]), idx2)[0::2]
            gidx = np.arange(n, dtype=np.int64) * lstr_len
            sgy = np.add.reduceat(np.concatenate([gidx, sent]), idx2)[0::2]
            sky = sgy - st_e * sy
            sk = cn_e * (cn_e - 1) // 2
            sk2 = (cn_e - 1) * cn_e * (2 * cn_e - 1) // 6
            A_e = cn_e * sky - sk * sy
            B_e = cn_e * sk2 - sk * sk
            skewed = (B_e > 0) & (np.abs(A_e) >= cfg.slope_threshold * B_e)
            # recompute oversized blocks' gate with Python's arbitrary-
            # precision ints — same arithmetic as the per-page path and
            # the oracle. Two wrap routes: B_e ~ cn^4/12 (cn bound) and
            # A_e <= ~1.5*cn^2*sum(leads) (pathological indents); the
            # float test is conservative with 3x headroom under 2^63
            unsafe = (
                cn_e.astype(np.float64) ** 2 * sy.astype(np.float64)
            ) > 3.0e18
            oversize = np.flatnonzero((cn_e > _LS_GATE_MAX_LINES) | unsafe)
            exact_ab: dict[int, tuple] = {}
            for j in oversize:
                st_j, cn_j = int(st_e[j]), int(cn_e[j])
                A, B = _ls_slope_int(
                    [int(v) for v in lstr_len[st_j : st_j + cn_j]]
                )
                skewed[j] = B > 0 and abs(A) >= cfg.slope_threshold * B
                exact_ab[int(j)] = (A, B)  # int64 A_e/B_e may have wrapped

            # batched profiles: ALL narrow blocks (straight and
            # skewed) share ONE UTF-32 grid per chunk instead of
            # per-block numpy dispatch; straight blocks run the
            # grid-vectorized valley machinery, skewed blocks feed
            # their chunk ink rows straight into the shear grid
            WCAP = 192
            gridable = np.flatnonzero((wb > 0) & (wb <= WCAP))
            pos = 0
            while pos < len(gridable):
                take = []
                tot = 0
                while pos < len(gridable) and tot < 16384:
                    j = int(gridable[pos])
                    take.append(j)
                    tot += int(cn_e[j])
                    pos += 1
                sel = np.asarray(take, dtype=np.int64)
                st_s = st_e[sel]
                cn_s = cn_e[sel]
                reg_first = np.cumsum(cn_s) - cn_s
                li = np.repeat(st_s - reg_first, cn_s) + np.arange(
                    int(cn_s.sum()), dtype=np.int64
                )
                grid = (
                    lines_np[li]
                    .astype(f"U{WCAP}")
                    .view(np.uint32)
                    .reshape(len(li), WCAP)
                )
                lens_li = raw_len[li]
                ink = (grid != 32) & (
                    np.arange(WCAP, dtype=np.int64)[None, :] < lens_li[:, None]
                )
                # per-block column sums via ONE bincount over the ink
                # coordinates (touches only the ~3% inked cells, vs a
                # full-grid cumsum); the same coordinate arrays feed
                # the shear grid for skewed blocks below
                nsk = ~skewed[sel]
                rows_nz, cols_nz = np.nonzero(ink)
                blk_of_row = np.repeat(
                    np.arange(len(take), dtype=np.int64), cn_s
                )
                blk_nz = blk_of_row[rows_nz]
                prof_all = np.bincount(
                    blk_nz * WCAP + cols_nz, minlength=len(take) * WCAP
                ).reshape(len(take), WCAP)
                # batched valley machinery: quick reject, run
                # extraction, smoothing and prominence all run as grid
                # ops over the whole chunk (bit-identical per row to
                # the scalar _select_gutters — A/B-fuzzed)
                gl = _select_gutters_batch(prof_all[nsk], wb[sel][nsk], cfg)
                gi = 0
                pend = []  # sheared blocks: (j, st, shifts, sh_prof)
                skew_jj = []
                for jj, j in enumerate(take):
                    if not skewed[j]:
                        g = gl[gi]
                        gi += 1
                        gutter_cache[int(st_e[j])] = (None, None, g)
                        if g:
                            complex_page[r_page[eligible[j]]] = True
                    else:
                        skew_jj.append(jj)
                if skew_jj:
                    # the whole chunk's shear grids in one batch; ink
                    # coordinates come from the shared bincount pass
                    specs = []
                    for jj in skew_jj:
                        j = take[jj]
                        rf = int(reg_first[jj])
                        n_ = int(cn_s[jj])
                        st = int(st_e[j])
                        lo = np.searchsorted(blk_nz, jj)
                        hi = np.searchsorted(blk_nz, jj + 1)
                        ab = exact_ab.get(int(j))
                        if ab is None:
                            ab = (int(A_e[j]), int(B_e[j]))
                        specs.append(
                            (
                                ab[0],
                                ab[1],
                                lens_li[rf : rf + n_],
                                rows_nz[lo:hi] - rf,
                                cols_nz[lo:hi],
                            )
                        )
                    for jj, res in zip(
                        skew_jj, _choose_shear_batch(specs, cfg)
                    ):
                        j = take[jj]
                        st = int(st_e[j])
                        if res is not None:
                            # sheared-profile gutters batch below
                            pend.append((j, st, res[1], res[2]))
                            continue
                        n_ = int(cn_s[jj])
                        g = _find_gutters(
                            lines_np, raw_len, range(st, st + n_), cfg
                        )
                        gutter_cache[st] = (None, None, g)
                        if g:
                            complex_page[r_page[eligible[j]]] = True
                if pend:
                    wmaxp = max(len(p[3]) for p in pend)
                    pgrid = np.zeros((len(pend), wmaxp), dtype=np.int64)
                    for r, (_j, _st, _sh, pr) in enumerate(pend):
                        pgrid[r, : len(pr)] = pr
                    gls = _select_gutters_batch(
                        pgrid, [len(p[3]) for p in pend], cfg
                    )
                    for r, (j, st, sh, pr) in enumerate(pend):
                        g = gls[r]
                        gutter_cache[st] = (sh, pr, g)
                        if g:
                            complex_page[r_page[eligible[j]]] = True

            # wide blocks (> WCAP): per-block path (shear grid / grid
            # fallback)
            rest = np.flatnonzero(wb > WCAP)
            for j in rest:
                n_ = int(cn_e[j])
                st = int(st_e[j])
                shifts = None
                sh_prof = None
                if skewed[j]:
                    lens_r = raw_len[st : st + n_]
                    wblk = int(wb[j])
                    if wblk > 0:
                        blk = lines_np[st : st + n_]
                        grid = blk.astype(f"U{wblk}").view(np.uint32).reshape(n_, wblk)
                        valid = (
                            np.arange(wblk, dtype=np.int64)[None, :]
                            < lens_r[:, None]
                        )
                        ink = (grid != 32) & valid
                        res = _choose_shear(
                            ink, lens_r, lstr_len[st : st + n_], cfg
                        )
                        if res is not None:
                            _s_star, shifts, sh_prof = res
                if shifts is not None:
                    g = _select_gutters(sh_prof, cfg)
                else:
                    g = _find_gutters(lines_np, raw_len, range(st, st + n_), cfg)
                gutter_cache[st] = (shifts, sh_prof, g)
                if g:
                    complex_page[r_page[eligible[j]]] = True
        simple_page = ~complex_page
        # fast region table: real regions on simple non-tool pages +
        # one pseudo-region per non-empty tool page
        if len(starts):
            rmask = simple_page[r_page] & ~tool_page[r_page]
            fr_start = starts[rmask]
            fr_count = counts[rmask]
            fr_label = r_label[rmask]
            fr_band = band[starts][rmask]
            fr_page = r_page[rmask]
        else:
            fr_start = fr_count = fr_label = fr_band = fr_page = np.zeros(0, np.int64)
        tp = np.flatnonzero(tool_page & (n_per > 0))
        if len(tp):
            fr_start = np.concatenate([fr_start, firsts[tp]])
            fr_count = np.concatenate([fr_count, n_per[tp]])
            fr_label = np.concatenate([fr_label, np.full(len(tp), C_TOOL, np.int8)])
            fr_band = np.concatenate([fr_band, np.zeros(len(tp), np.int64)])
            fr_page = np.concatenate([fr_page, tp])
        if len(fr_start):
            fast_df = _emit_fast(
                fr_start, fr_count, fr_label, fr_band, fr_page,
                pdf, stripped_np, line_start + lstr_len, s_len, lstr_len, cfg,
            )
        # §6p batched page-union profiles: every complex page with
        # >= 2 text blocks detects page columns over the UNION ink
        # profile of its text-block lines (SPEC §6p). Batching the
        # profiles into per-chunk coordinate bincounts + the grid
        # valley machinery removes the per-page U-grid build and
        # scalar _select_gutters call from the slow-path walk (the
        # two dominated _emit_page time once blocks were batched).
        # Pages wider than _PG_WCAP keep the per-page fallback.
        page_gutter_cache: dict[int, list] = {}
        cplx = complex_page & ~tool_page
        if cplx.any() and len(starts):
            txt_r = np.flatnonzero((r_label == C_TEXT) & cplx[r_page])
            ntb = np.bincount(r_page[txt_r], minlength=P)
            elig_r = txt_r[ntb[r_page[txt_r]] >= 2]
            if len(elig_r):
                st_r = starts[elig_r].astype(np.int64)
                cn_r = counts[elig_r].astype(np.int64)
                pg_of_r = r_page[elig_r]
                # per-page max text-line width via segment reductions
                idx2p = np.empty(2 * len(st_r), dtype=np.int64)
                idx2p[0::2] = st_r
                idx2p[1::2] = st_r + cn_r
                sentp = np.zeros(1, dtype=np.int64)
                wreg = np.maximum.reduceat(
                    np.concatenate([raw_len, sentp]), idx2p
                )[0::2]
                pw = np.zeros(P, dtype=np.int64)
                np.maximum.at(pw, pg_of_r, wreg)
                _PG_WCAP = 512
                keep = (pw[pg_of_r] > 0) & (pw[pg_of_r] <= _PG_WCAP)
                st_r, cn_r, pg_of_r = st_r[keep], cn_r[keep], pg_of_r[keep]
                # group regions by page (pages are contiguous after
                # this stable sort), then chunk pages by line volume
                order = np.argsort(pg_of_r, kind="stable")
                st_r, cn_r, pg_of_r = st_r[order], cn_r[order], pg_of_r[order]
                upage, ufirst = np.unique(pg_of_r, return_index=True)
                ulast = np.append(ufirst[1:], len(pg_of_r))
                pos = 0
                while pos < len(upage):
                    take_end = pos
                    tot = 0
                    while take_end < len(upage) and tot < 16384:
                        tot += int(
                            cn_r[ufirst[take_end] : ulast[take_end]].sum()
                        )
                        take_end += 1
                    rsel = slice(ufirst[pos], ulast[take_end - 1])
                    st_s, cn_s = st_r[rsel], cn_r[rsel]
                    pg_s = pg_of_r[rsel]
                    reg_first = np.cumsum(cn_s) - cn_s
                    li = np.repeat(st_s - reg_first, cn_s) + np.arange(
                        int(cn_s.sum()), dtype=np.int64
                    )
                    W = int(pw[upage[pos:take_end]].max())
                    grid = (
                        lines_np[li]
                        .astype(f"U{W}")
                        .view(np.uint32)
                        .reshape(len(li), W)
                    )
                    lens_li = raw_len[li]
                    ink = (grid != 32) & (
                        np.arange(W, dtype=np.int64)[None, :]
                        < lens_li[:, None]
                    )
                    # page slot per line row of this chunk
                    pslot = np.repeat(
                        np.searchsorted(upage[pos:take_end], pg_s), cn_s
                    )
                    rows_nz, cols_nz = np.nonzero(ink)
                    nchunk = take_end - pos
                    prof = np.bincount(
                        pslot[rows_nz] * W + cols_nz, minlength=nchunk * W
                    ).reshape(nchunk, W)
                    gl = _select_gutters_batch(
                        prof, pw[upage[pos:take_end]], cfg
                    )
                    for s, p in enumerate(upage[pos:take_end]):
                        # (page text width, gutters): the width bounds
                        # the final column segment in _emit_page
                        page_gutter_cache[int(offsets[p])] = (
                            int(pw[p]),
                            gl[s],
                        )
                    pos = take_end
        # --- widened fast path: complex pages WITHOUT page-gutter mode
        # (~96% of them) emit batch-vectorized via _emit_cols; only
        # pages where §6p page-column mode can fire (>= 2 text blocks
        # with a cached non-empty page gutter, or an uncached wide
        # page) keep the per-page walk ---------------------------------
        cols_df = None
        cplx_pages = np.flatnonzero(complex_page & ~tool_page)
        if _EMIT_COLS and len(cplx_pages):
            if len(starts):
                ntext_page = np.bincount(
                    r_page[r_label == C_TEXT], minlength=P
                )
            else:
                ntext_page = np.zeros(P, dtype=np.int64)
            take_cols = []
            fallback = []
            for t in cplx_pages:
                if ntext_page[t] >= 2:
                    ent = page_gutter_cache.get(int(offsets[t]))
                    if ent is None or ent[1]:
                        fallback.append(int(t))
                        continue
                take_cols.append(int(t))
            if take_cols:
                cols_df = _emit_cols(
                    take_cols, r_lo, r_hi, starts, counts, r_label,
                    band, r_page, lines_np, stripped_np, line_start,
                    lstr_len, s_len, raw_len, gutter_cache, pdf, cfg,
                )
            pages_iter = np.asarray(fallback, dtype=np.int64)
        else:
            pages_iter = cplx_pages
    else:
        gutter_cache = {}
        page_gutter_cache = {}
        cols_df = None
        pages_iter = np.arange(P)

    for t in pages_iter:
        if tool_page[t]:
            spans = []
            for i in range(offsets[t], offsets[t + 1]):
                if s_len[i] > 0:
                    cs = int(line_start[i] + lstr_len[i])
                    spans.append(
                        (len(spans), RT_TOOL, 0, cs, cs + int(s_len[i]), stripped_np[i])
                    )
            if want_diag:
                diag_rows.append(
                    (int(n_per[t]), len(spans), 1 if spans else 0, 1, 0.0, False, 100.0, False, False)
                )
            else:
                for row in spans:
                    span_rows.append((t,) + row)
            continue
        regions = [
            [
                _CODE_RT[reg_label[r]],
                int(band[starts[r]]),
                int(starts[r]),
                0,
                range(int(starts[r]), int(starts[r] + counts[r])),
            ]
            for r in range(r_lo[t], r_hi[t])
        ]
        res = _emit_page(
            regions,
            int(n_per[t]),
            float(ratio[t]),
            bool(used_b[t]),
            lines_np,
            stripped_np,
            line_start,
            lstr_len,
            s_len,
            raw_len,
            cfg,
            want_diag,
            gutter_cache,
            page_ctx=(int(offsets[t]), cls, active),
            page_gutter_cache=page_gutter_cache,
        )
        if want_diag:
            diag_rows.append(res + (bool(was_enh[t]),))
        else:
            for row in res:
                span_rows.append((t,) + row)

    if want_diag:
        out = pd.DataFrame(
            diag_rows,
            columns=[
                "n_lines",
                "n_spans",
                "n_regions",
                "max_columns",
                "slope",
                "is_deskewed",
                "agreement_ratio",
                "used_binarized",
                "was_enhanced",
            ],
        )
        out.insert(0, "conv_id", pdf["conv_id"].to_numpy())
        out.insert(1, "turn_idx", pdf["turn_idx"].to_numpy())
        return out

    # columnar construction: zip-transpose + typed arrays skips
    # pandas' slow mixed-type row conversion path
    if span_rows:
        tt, sidx, rtyp, rseq, cs, ce, txt = zip(*span_rows)
        ti = np.asarray(tt, dtype=np.int64)
        out = pd.DataFrame(
            {
                "conv_id": pdf["conv_id"].to_numpy()[ti],
                "turn_idx": pdf["turn_idx"].to_numpy()[ti],
                "span_idx": np.asarray(sidx, dtype=np.int64),
                "region_type": np.asarray(rtyp, dtype=object),
                "region_seq": np.asarray(rseq, dtype=np.int64),
                "char_start": np.asarray(cs, dtype=np.int64),
                "char_end": np.asarray(ce, dtype=np.int64),
                "text": np.asarray(txt, dtype=object),
            }
        )
    else:
        out = pd.DataFrame(
            {
                "conv_id": pd.Series([], dtype="object"),
                "turn_idx": pd.Series([], dtype="int64"),
                "span_idx": pd.Series([], dtype="int64"),
                "region_type": pd.Series([], dtype="object"),
                "region_seq": pd.Series([], dtype="int64"),
                "char_start": pd.Series([], dtype="int64"),
                "char_end": pd.Series([], dtype="int64"),
                "text": pd.Series([], dtype="object"),
            }
        )
    if as_frames:
        frames = []
        if fast_df is not None and len(fast_df):
            frames.append(fast_df)
        if cols_df is not None and len(cols_df):
            frames.append(cols_df)
        if len(out):
            frames.append(out)
        return frames
    done = [
        f
        for f in (fast_df, cols_df, out)
        if f is not None and len(f)
    ]
    if not done:
        return out
    return done[0] if len(done) == 1 else pd.concat(done, ignore_index=True)


# A/B switch for the batched column-page emission (_emit_cols): tests
# force it off to drive every complex page through the per-page
# _emit_page walk and assert bit-identical output
_EMIT_COLS = True

# reading-order type group per line class (SPEC §7)
_TG_LUT = np.full(16, 9, dtype=np.int8)
_TG_LUT[C_HEADER] = 0
_TG_LUT[C_TEXT] = 1
_TG_LUT[C_TOOL] = 1
_TG_LUT[C_TABLE] = 1
_TG_LUT[C_DROPCAP] = 1
_TG_LUT[C_MARG] = 2
_TG_LUT[C_SEP] = 3


def _emit_core(lb, pg, bd, rl, cs, ce, texts, spn_len, cola, colb, pdf, cfg):
    """Shared array engine for SPEC §§8,9,10 over ORDERED regions and
    their span arrays: the §8 drop-capital merge and the §9
    overlap-argmax fragment adherence run as array patches, span-less
    regions vanish, regions and spans number per page, span fields
    gather into the output frame — numpy throughout except the (rare)
    per-merge patch loops.

    Per-region (in final reading order): lb (class codes), pg (page
    ids, ascending), bd (bands). Per-span (grouped by region, ascending
    rl, reading order within region): cs/ce/texts/spn_len plus the §9
    column range cola/colb (profile coordinates). All span arrays must
    be writable copies — §8/§9 patch them in place."""
    R = len(lb)
    if len(rl) == 0:
        return None
    kept_per_region = np.bincount(rl, minlength=R)

    # §8 drop-capital merge: a dropcap whose next non-empty region (in
    # final order) is a TEXT region of the same page+band folds its
    # char onto that region's first span; the dropcap region vanishes
    merged_src: dict[int, int] = {}
    dc_idx = np.flatnonzero(lb == C_DROPCAP)
    for i in dc_idx:
        if kept_per_region[i] == 0:
            continue  # span-less dropcap: absent from the page walk
        j = i + 1
        while j < R and kept_per_region[j] == 0:
            j += 1
        if (
            j < R
            and pg[j] == pg[i]
            and lb[j] == C_TEXT
            and bd[j] == bd[i]
        ):
            merged_src[int(j)] = int(i)
    if merged_src:
        dc_first = {}
        dropped = np.zeros(R, dtype=bool)
        for j, i in merged_src.items():
            dropped[i] = True
            p = int(np.searchsorted(rl, i))
            dc_first[j] = (cs[p], texts[p], spn_len[p])
        m = ~dropped[rl]
        rl = rl[m]
        cs = cs[m]
        ce = ce[m]
        texts = texts[m]
        spn_len = spn_len[m]
        cola = cola[m]
        colb = colb[m]
        kept_per_region = np.bincount(rl, minlength=R)
        if len(rl) == 0:
            return None
        for j, (dcs, dtext, dlen) in dc_first.items():
            pos = int(np.searchsorted(rl, j))
            texts[pos] = dtext + texts[pos]
            cs[pos] = dcs
            spn_len[pos] += dlen

    # §9 overlap-argmax fragment adherence (SPEC §9), as a patch over
    # the span arrays: fragments in TEXT regions merge into the big
    # span with maximal column overlap (ties: index-nearest, then
    # earliest); fragment spans are then excluded before numbering.
    # The merged dropcap span keeps the TARGET's column range (cola/
    # colb are never patched), matching the per-page walk.
    drop_span = np.zeros(len(rl), dtype=bool)
    frag_mask = (spn_len <= cfg.small_fragment_max_len) & (lb[rl] == C_TEXT)
    if frag_mask.any():
        uregs = np.unique(rl[frag_mask])
        ua0 = np.searchsorted(rl, uregs)
        ua1 = np.searchsorted(rl, uregs, side="right")
        for a0, a1 in zip(ua0.tolist(), ua1.tolist()):
            k = a1 - a0
            sl = spn_len[a0:a1]
            fa = cola[a0:a1]
            fe = colb[a0:a1]
            is_frag = sl <= cfg.small_fragment_max_len
            bigs = [x for x in range(k) if not is_frag[x]]
            if not bigs:
                continue  # fragment-only region keeps its spans
            pre = {x: [] for x in bigs}
            suf = {x: [] for x in bigs}
            for j in range(k):
                if not is_frag[j]:
                    continue
                best, bo, bdist = bigs[0], -1, None
                for x in bigs:
                    ov = max(0, int(min(fe[j], fe[x])) - int(max(fa[j], fa[x])))
                    dist = abs(j - x)
                    if ov > bo or (ov == bo and dist < bdist):
                        best, bo, bdist = x, ov, dist
                (pre if j < best else suf)[best].append(j)
                drop_span[a0 + j] = True
            for x in bigs:
                if not pre[x] and not suf[x]:
                    continue
                pos = a0 + x
                if pre[x]:
                    texts[pos] = (
                        " ".join(texts[a0 + p] for p in pre[x]) + " " + texts[pos]
                    )
                    cs[pos] = cs[a0 + pre[x][0]]
                if suf[x]:
                    texts[pos] = (
                        texts[pos] + " " + " ".join(texts[a0 + p] for p in suf[x])
                    )
                    ce[pos] = ce[a0 + suf[x][-1]]
        if drop_span.any():
            m = ~drop_span
            rl = rl[m]
            cs = cs[m]
            ce = ce[m]
            texts = texts[m]
            kept_per_region = np.bincount(rl, minlength=R)
            if len(rl) == 0:
                return None

    # regions with zero surviving spans vanish before numbering
    ne = np.flatnonzero(kept_per_region > 0)
    pg_ne = pg[ne]
    seq_ne = np.arange(len(ne), dtype=np.int64) - np.searchsorted(pg_ne, pg_ne)
    region_seq = np.zeros(R, dtype=np.int64)
    region_seq[ne] = seq_ne

    span_page = pg[rl]
    span_idx = np.arange(len(rl), dtype=np.int64) - np.searchsorted(span_page, span_page)

    rt_lut = np.empty(16, dtype=object)
    for code, rt in _CODE_RT.items():
        rt_lut[code] = rt
    rt_lut[C_DROPCAP] = RT_DROPCAP  # unmerged dropcaps keep the spec type
    conv_vals = pdf["conv_id"].to_numpy()
    turn_vals = pdf["turn_idx"].to_numpy()
    return pd.DataFrame(
        {
            "conv_id": conv_vals[span_page],
            "turn_idx": turn_vals[span_page],
            "span_idx": span_idx,
            "region_type": rt_lut[lb[rl]],
            "region_seq": region_seq[rl],
            "char_start": cs,
            "char_end": ce,
            "text": texts,
        }
    )


def _emit_fast(
    fr_start, fr_count, fr_label, fr_band, fr_page,
    pdf, strp_np, cstart, s_len, lead, cfg,
):
    """Array-native span emission for column-free regions: sort regions
    by (page, band, type-group, first_line), derive one span per
    non-blank line, hand off to the shared ``_emit_core`` engine."""
    order = np.lexsort((fr_start, _TG_LUT[fr_label], fr_band, fr_page))
    st = fr_start[order].astype(np.int64)
    cn = fr_count[order].astype(np.int64)
    pg = fr_page[order].astype(np.int64)
    bd = fr_band[order].astype(np.int64)
    lb = fr_label[order]

    total = int(cn.sum())
    if total == 0:
        return None
    reg_first = np.cumsum(cn) - cn
    line_ids = np.repeat(st - reg_first, cn) + np.arange(total, dtype=np.int64)
    reg_of_line = np.repeat(np.arange(len(st), dtype=np.int64), cn)
    keep = s_len[line_ids] > 0
    li = line_ids[keep]
    rl = reg_of_line[keep]
    if len(li) == 0:
        return None
    cs = cstart[li]
    spn = s_len[li].copy()
    return _emit_core(
        lb, pg, bd, rl,
        cs.copy(), cs + spn, strp_np[li], spn,
        lead[li], lead[li] + spn,
        pdf, cfg,
    )


def _emit_cols(
    pages, r_lo, r_hi, starts, counts, r_label, band, r_page,
    lines_np, stripped_np, line_start, lstr_len, s_len, raw_len,
    gutter_cache, pdf, cfg,
):
    """Array-native span emission for COLUMN pages without page-gutter
    mode (SPEC §6 column split + §6m marginalia + §§7-10) — the
    widened fast path: ~96% of complex pages are block-gutter-only and
    previously walked ``_emit_page`` one page at a time.

    Guttered text regions expand into per-column sub-regions; the
    column piece trim runs as ONE batched searchsorted over the
    chunk-gridded non-whitespace coordinates (exact ``str.strip()``
    parity via _WS_LUT) instead of per-piece slice+lstrip+rstrip;
    plain regions reuse the line-span arrays; everything merges into
    one region table ordered by (page, band, type-group, first, col)
    and finishes in the shared ``_emit_core`` engine. Bit-identical to
    the per-page walk (A/B-fuzzed in tests/test_kernel_oracle.py)."""
    K = 1 + int(raw_len.max()) if len(raw_len) else 1

    # --- region tables: plain regions (one row) vs guttered text ---
    rg_lab, rg_bd, rg_first, rg_col, rg_pg = [], [], [], [], []
    a_start, a_count = [], []  # plain regions, parallel to their rows
    gregs = []  # (start, count, shifts, gutters, w, band, page)
    for t in pages:
        for r in range(r_lo[t], r_hi[t]):
            st_r = int(starts[r])
            cn_r = int(counts[r])
            lab = int(r_label[r])
            bd_r = int(band[st_r])
            ent = gutter_cache.get(st_r) if lab == C_TEXT else None
            if ent is not None and ent[2]:
                shifts, sh_prof, gutters = ent
                if shifts is not None:
                    w = len(sh_prof)
                else:
                    w = int(raw_len[st_r : st_r + cn_r].max())
                gregs.append((st_r, cn_r, shifts, gutters, w, bd_r, int(t)))
            else:
                rg_lab.append(lab)
                rg_bd.append(bd_r)
                rg_first.append(st_r)
                rg_col.append(0)
                rg_pg.append(int(t))
                a_start.append(st_r)
                a_count.append(cn_r)

    # --- guttered regions: batched column piece extraction ---------------
    pair_meta = []  # per (region, col): (greg_ord, col, a, b)
    if gregs:
        g_start = np.asarray([g[0] for g in gregs], dtype=np.int64)
        g_count = np.asarray([g[1] for g in gregs], dtype=np.int64)
        g_lineoff = np.cumsum(g_count) - g_count
        Lg = int(g_count.sum())
        li_g = np.repeat(g_start - g_lineoff, g_count) + np.arange(
            Lg, dtype=np.int64
        )
        shift_flat = np.zeros(Lg, dtype=np.int64)
        for go, (st_r, cn_r, shifts, _g, _w, _b, _t) in enumerate(gregs):
            if shifts is not None:
                off = int(g_lineoff[go])
                shift_flat[off : off + cn_r] = np.asarray(shifts, dtype=np.int64)
        # chunked non-whitespace coordinates (line-major => sorted keys)
        key_chunks = []
        pos = 0
        while pos < Lg:
            end = min(pos + 16384, Lg)
            sel = li_g[pos:end]
            Wc = int(raw_len[sel].max()) if end > pos else 0
            if Wc > 0:
                grid = (
                    lines_np[sel]
                    .astype(f"U{Wc}")
                    .view(np.uint32)
                    .reshape(end - pos, Wc)
                )
                valid = (
                    np.arange(Wc, dtype=np.int64)[None, :]
                    < raw_len[sel][:, None]
                )
                nonws = valid & ~_WS_LUT[np.where(grid <= 0x3000, grid, 0)]
                rows_nz, cols_nz = np.nonzero(nonws)
                key_chunks.append((rows_nz + pos) * K + cols_nz)
            pos = end
        flat_keys = (
            np.concatenate(key_chunks) if key_chunks else np.zeros(0, np.int64)
        )
        # (region, col) pairs, col-ascending per region
        for go, (_st, _cn, _sh, gutters, w, _b, _t) in enumerate(gregs):
            prev = 0
            for g0, g1 in gutters:
                pair_meta.append((go, len(pair_meta), prev, g0))
                prev = g1 + 1
            pair_meta.append((go, len(pair_meta), prev, w))
        pr_greg = np.asarray([p[0] for p in pair_meta], dtype=np.int64)
        pr_a = np.asarray([p[2] for p in pair_meta], dtype=np.int64)
        pr_b = np.asarray([p[3] for p in pair_meta], dtype=np.int64)
        # (pair, line) triples: window searchsorted over the flat keys
        tri_cnt = g_count[pr_greg]
        tri_first = np.cumsum(tri_cnt) - tri_cnt
        n_tri = int(tri_cnt.sum())
        tri_pair = np.repeat(np.arange(len(pair_meta), dtype=np.int64), tri_cnt)
        tri_line = (
            np.repeat(g_lineoff[pr_greg] - tri_first, tri_cnt)
            + np.arange(n_tri, dtype=np.int64)
        )
        sh_t = shift_flat[tri_line]
        base = tri_line * K
        # clamp the window into the line's key slot: a shifted segment
        # end can exceed the widest line (K - 1), and an unclamped key
        # would bleed into the NEXT line's coordinates
        i0 = np.searchsorted(
            flat_keys, base + np.minimum(pr_a[tri_pair] + sh_t, K - 1)
        )
        i1 = np.searchsorted(
            flat_keys, base + np.minimum(pr_b[tri_pair] + sh_t, K - 1)
        )
        has = i1 > i0
        tl_h = tri_line[has]
        s0 = flat_keys[i0[has]] - tl_h * K
        s1 = flat_keys[i1[has] - 1] - tl_h * K
        gl = li_g[tl_h]
        sh_h = sh_t[has]
        lenB = s1 + 1 - s0
        csB = line_start[gl] + s0
        ceB = csB + lenB
        colaB = s0 - sh_h
        colbB = s1 + 1 - sh_h
        textsB = np.empty(len(gl), dtype=object)
        e0 = s0.tolist()
        e1 = (s1 + 1).tolist()
        for x, i in enumerate(gl.tolist()):
            textsB[x] = lines_np[i][e0[x] : e1[x]]
        spB = tri_pair[has]
        pair_nspan = np.bincount(spB, minlength=len(pair_meta))
        pair_maxlen = np.zeros(len(pair_meta), dtype=np.int64)
        np.maximum.at(pair_maxlen, spB, lenB)
        # §6m projection marginalia + sub-region rows (non-empty pairs
        # only, matching the per-page col_entries)
        rel = round(cfg.marginalia_width_frac * 100)
        pair_row = np.full(len(pair_meta), -1, dtype=np.int64)
        p_at = 0
        for go, (_st, _cn, _sh, gutters, w, bd_r, t) in enumerate(gregs):
            n_cols = len(gutters) + 1
            ent = [
                p_at + c for c in range(n_cols) if pair_nspan[p_at + c] > 0
            ]
            n_e = len(ent)
            for idx, p in enumerate(ent):
                rt = C_TEXT
                if n_e >= 2 and (idx == 0 or idx == n_e - 1):
                    wd = int(pr_b[p] - pr_a[p])
                    others = max(
                        int(pr_b[q] - pr_a[q]) for q in ent if q != p
                    )
                    if (
                        wd * 100 <= rel * w
                        and 2 * wd <= others
                        and pair_maxlen[p] <= cfg.marginalia_max_len
                    ):
                        rt = C_MARG
                pair_row[p] = len(rg_lab)
                rg_lab.append(rt)
                rg_bd.append(bd_r)
                rg_first.append(int(_st))
                rg_col.append(int(p - p_at))
                rg_pg.append(t)
            p_at += n_cols

    if not rg_lab:
        return None
    lb0 = np.asarray(rg_lab, dtype=np.int8)
    bd0 = np.asarray(rg_bd, dtype=np.int64)
    fi0 = np.asarray(rg_first, dtype=np.int64)
    co0 = np.asarray(rg_col, dtype=np.int64)
    pg0 = np.asarray(rg_pg, dtype=np.int64)
    order = np.lexsort((co0, fi0, _TG_LUT[lb0], bd0, pg0))
    new_of_old = np.empty(len(rg_lab), dtype=np.int64)
    new_of_old[order] = np.arange(len(rg_lab), dtype=np.int64)

    # span table (construction order), then ONE stable argsort groups
    # spans under their ordered region — no per-region Python loop.
    # Plain-region line spans via the same repeat trick as _emit_fast:
    if a_start:
        stA = np.asarray(a_start, dtype=np.int64)
        cnA = np.asarray(a_count, dtype=np.int64)
        regfA = np.cumsum(cnA) - cnA
        totA = int(cnA.sum())
        lidA = np.repeat(stA - regfA, cnA) + np.arange(totA, dtype=np.int64)
        rowA = np.repeat(np.arange(len(stA), dtype=np.int64), cnA)
        keepA = s_len[lidA] > 0
        ids = lidA[keepA]
        rlA = new_of_old[rowA[keepA]]  # plain rows are ids 0..nA-1
        c0 = line_start[ids] + lstr_len[ids]
        lnA = s_len[ids]
        csA_, ceA_, txA_ = c0, c0 + lnA, stripped_np[ids]
        caA_, cbA_ = lstr_len[ids], lstr_len[ids] + lnA
    else:
        z = np.zeros(0, dtype=np.int64)
        rlA = csA_ = ceA_ = lnA = caA_ = cbA_ = z
        txA_ = np.zeros(0, dtype=object)
    if gregs and len(spB):
        rlB = new_of_old[pair_row[spB]]
        sp_rl = np.concatenate([rlA, rlB])
        sp_cs = np.concatenate([csA_, csB])
        sp_ce = np.concatenate([ceA_, ceB])
        sp_tx = np.concatenate([txA_, textsB])
        sp_ln = np.concatenate([lnA, lenB])
        sp_ca = np.concatenate([caA_, colaB])
        sp_cb = np.concatenate([cbA_, colbB])
    else:
        sp_rl, sp_cs, sp_ce, sp_tx = rlA, csA_, ceA_, txA_
        sp_ln, sp_ca, sp_cb = lnA, caA_, cbA_
    if len(sp_rl) == 0:
        return None
    sorder = np.argsort(sp_rl, kind="stable")
    return _emit_core(
        lb0[order], pg0[order], bd0[order],
        sp_rl[sorder], sp_cs[sorder].copy(), sp_ce[sorder].copy(),
        sp_tx[sorder], sp_ln[sorder].copy(), sp_ca[sorder], sp_cb[sorder],
        pdf, cfg,
    )


# region-type string for each line class that can open a region
_CODE_RT = {
    C_TEXT: RT_TEXT,
    C_TABLE: RT_TABLE,
    C_TOOL: RT_TOOL,
    C_MARG: RT_MARGINALIA,
    C_HEADER: RT_HEADER,
    C_DROPCAP: "dropcap",
    C_SEP: RT_SEPARATOR,
}


def _split_long_spans(spans, cfg: ExtractConfig):
    """SPEC §9L curved-line splitting (-cl mode analog,
    separate_lines.py:128-673): long spans subdivide at the smoothed
    VALLEYS of their own char-ink profile — the §6 integer-gaussian
    valley machinery run per span, with sigma scaled by span length
    (the data-dependent-sigma analog, separate_lines.py:240-265).
    Only active when cfg.enable_line_split."""
    out = []
    for sp in spans:
        cs, ce, text, ca, cb = sp
        L = len(text)
        if L < cfg.line_split_min_len:
            out.append(sp)
            continue
        sigma = cfg.line_split_sigma * min(
            1 + L // cfg.line_split_scale, cfg.line_split_max_scale
        )
        v = _ink_row(text)
        sm = _smooth_profile(v.astype(np.int64), sigma)
        max_s = int(sm.max()) if L else 0
        cuts = []
        if max_s > 0:
            rel_pct = int(round(cfg.line_split_rel_depth * 100))
            peak_pct = int(round(cfg.gutter_peak_frac * 100))
            p = 0
            while p < L:
                if text[p] == " ":
                    q = p
                    while q + 1 < L and text[q + 1] == " ":
                        q += 1
                    if q - p + 1 >= cfg.line_split_gap:
                        depth = int(sm[p : q + 1].min())
                        if depth * 100 <= rel_pct * max_s:
                            left = int(sm[:p].max()) if p > 0 else 0
                            right = int(sm[q + 1 :].max()) if q + 1 < L else 0
                            if min(left, right) * 100 >= peak_pct * max_s:
                                cuts.append((p, q))
                    p = q + 1
                else:
                    p += 1
        if not cuts:
            out.append(sp)
            continue
        pieces = []
        last_end = 0
        for a, b in cuts:
            if a > last_end:
                pieces.append((last_end, a))
            last_end = b + 1
        if last_end < L:
            pieces.append((last_end, L))
        if len(pieces) <= 1:
            out.append(sp)
            continue
        for a, b in pieces:
            out.append((cs + a, cs + b, text[a:b], ca + a, ca + b))
    return out


def _col_of(p: int, gutters) -> int:
    """Column index of raw position p given page gutters: the number
    of gutters entirely to its left (SPEC §6p)."""
    c = 0
    for _g0, g1 in gutters:
        if g1 < p:
            c += 1
    return c


def _emit_page(
    regions, n, ratio, used_b,
    raw, strp, lstart, lead, slen, rlen,
    cfg: ExtractConfig, want_diag: bool, gutter_cache=None,
    page_ctx=None, page_gutter_cache=None,
):
    """SPEC §§6-10 for one page: column split, span materialization,
    reading order, drop-capital merge, small-fragment adherence,
    emission. ``regions`` is [[rtype, band, first_line, col, lids]] with
    batch-global line indices into the per-line feature arrays.
    ``page_ctx`` = (page_first_line, cls_array, active_array) enables
    the §6p page-column band recompute."""

    def diag_or_spans(spans, n_regions, max_cols, slope):
        if want_diag:
            return (
                n, len(spans), n_regions, max_cols, slope,
                bool(abs(slope) >= cfg.slope_threshold), ratio, used_b,
            )
        return spans

    # --- §6 pre-pass: per-block deskew + gutters (memoized) ---------------
    block_res = {}  # rfirst -> (shifts, sh_prof, gutters)
    n_text_blocks = 0
    for rtype, rband, rfirst, _c, lids in regions:
        if rtype != RT_TEXT:
            continue
        n_text_blocks += 1
        if gutter_cache is not None and rfirst in gutter_cache:
            block_res[rfirst] = gutter_cache[rfirst]
            continue
        shifts = None
        sh_prof = None
        if len(lids) >= cfg.min_block_lines:
            A, B = _ls_slope_int([int(lead[i]) for i in lids])
            if B > 0 and abs(A) >= cfg.slope_threshold * B:
                res = _choose_shear(
                    [_ink_row(raw[i]) for i in lids],
                    [int(rlen[i]) for i in lids],
                    [int(lead[i]) for i in lids],
                    cfg,
                )
                if res is not None:
                    _s_star, shifts, sh_prof = res
        if shifts is not None:
            gutters = _select_gutters(sh_prof, cfg)
        elif len(lids) < cfg.min_block_lines:
            gutters = []
        else:
            gutters = _find_gutters(raw, rlen, lids, cfg)
        block_res[rfirst] = (shifts, sh_prof, gutters)

    # --- §6p page-column mode (return_boxes_of_images_by_order_of_
    # reading_new analog, utils/__init__.py:1599-2255): when >= 2 text
    # blocks exist and any block shows column structure, detect gutters
    # over the UNION ink profile of all text-block lines; if found, the
    # whole page splits by the page gutters and regions order
    # column-major ACROSS bands. -------------------------------------------
    page_gutters = None
    page_w = 0
    if (
        n_text_blocks >= 2
        and any(g for (_s, _p, g) in block_res.values())
        and page_gutter_cache is not None
        and page_ctx is not None
        and page_ctx[0] in page_gutter_cache
    ):
        # batched pre-pass already ran the union-profile valley scan
        page_w, pg = page_gutter_cache[page_ctx[0]]
        page_gutters = pg if pg else None
    elif n_text_blocks >= 2 and any(g for (_s, _p, g) in block_res.values()):
        all_lids = np.asarray(
            [i for r in regions if r[0] == RT_TEXT for i in r[4]], dtype=np.int64
        )
        lens_pg = rlen[all_lids]
        page_w = int(lens_pg.max()) if len(all_lids) else 0
        if 0 < page_w <= 512:
            grid = (
                raw[all_lids]
                .astype(f"U{page_w}")
                .view(np.uint32)
                .reshape(len(all_lids), page_w)
            )
            valid = (
                np.arange(page_w, dtype=np.int64)[None, :] < lens_pg[:, None]
            )
            prof = ((grid != 32) & valid).sum(axis=0).astype(np.int64)
            pg = _select_gutters(prof, cfg)
            if pg:
                page_gutters = pg
        elif page_w > 512:
            prof = np.zeros(page_w, dtype=np.int64)
            for i in all_lids:
                row = _ink_row(raw[i])
                if len(row):
                    prof[: len(row)] += row
            pg = _select_gutters(prof, cfg)
            if pg:
                page_gutters = pg

    # §6p band recompute + column assignment: a separator contained in
    # ONE column (mother/child containment, utils/__init__.py:213-297)
    # no longer advances the global band counter; every region gets the
    # column holding its first line's first ink
    if page_gutters is not None and page_ctx is not None:
        page_first, cls_arr, active_arr = page_ctx
        band_line = [0] * n
        band = 0
        run = 0
        for k in range(n):
            i = page_first + k
            band_line[k] = band
            if not active_arr[i]:
                continue  # border lines: outside the page walk
            if cls_arr[i] == C_BLANK:
                run += 1
                if run == cfg.band_blank_gap:
                    band += 1
                continue
            run = 0
            if cls_arr[i] == C_SEP:
                a = int(lead[i])
                b = a + int(slen[i])
                if b > a and _col_of(a, page_gutters) != _col_of(b - 1, page_gutters):
                    band += 1
        for r in regions:
            r[1] = band_line[r[2] - page_first]
            r[3] = _col_of(int(lead[r[2]]), page_gutters)

    # §6 column split + span materialization. Span tuples carry their
    # within-line column range (col_a, col_b) for the §9 overlap-argmax
    # adherence; emission drops the extra fields.
    out_regions = []  # (rtype, band, first_line, col_idx, [(cs, ce, text, col_a, col_b)])
    max_cols = 1
    sx: list[int] = []
    sy: list[int] = []

    def strip_span(i):
        cs = int(lstart[i] + lead[i])
        ca = int(lead[i])
        return (cs, cs + int(slen[i]), strp[i], ca, ca + int(slen[i]))

    for rtype, rband, rfirst, _c, lids in regions:
        if rtype == RT_TEXT:
            if page_gutters is not None:
                shifts, sh_prof, gutters = None, None, page_gutters
            else:
                shifts, sh_prof, gutters = block_res[rfirst]
            if gutters:
                max_cols = max(max_cols, len(gutters) + 1)
                if page_gutters is not None:
                    w = page_w
                elif shifts is not None:
                    w = len(sh_prof)
                else:
                    w = int(max(rlen[i] for i in lids))
                segs = []
                prev = 0
                for g0, g1 in gutters:
                    segs.append((prev, g0))
                    prev = g1 + 1
                segs.append((prev, w))
                col_entries = []
                for col, (a, b) in enumerate(segs):
                    col_spans = []
                    for k, i in enumerate(lids):
                        sh = shifts[k] if shifts is not None else 0
                        piece = raw[i][a + sh : b + sh]
                        # single left scan + right scan (strip() +
                        # lstrip() would walk the left edge twice)
                        ls = piece.lstrip()
                        if not ls:
                            continue
                        s = ls.rstrip()
                        pl = len(piece) - len(ls)
                        cs = int(lstart[i]) + a + sh + pl
                        col_spans.append((cs, cs + len(s), s, a + pl, a + pl + len(s)))
                    if col_spans:
                        col_entries.append((col, a, b, col_spans))
                # §6m projection-based marginalia (utils/marginals.py
                # analog): a narrow, short-lined OUTER column is a
                # marginalia region, not a text column
                n_e = len(col_entries)
                rel = round(cfg.marginalia_width_frac * 100)
                for idx, (col, a, b, col_spans) in enumerate(col_entries):
                    rt = RT_TEXT
                    if n_e >= 2 and (idx == 0 or idx == n_e - 1):
                        wd = b - a
                        others = max(
                            bb - aa
                            for j, (_c, aa, bb, _s) in enumerate(col_entries)
                            if j != idx
                        )
                        if (
                            wd * 100 <= rel * w
                            and 2 * wd <= others
                            and all(
                                len(sp[2]) <= cfg.marginalia_max_len
                                for sp in col_spans
                            )
                        ):
                            rt = RT_MARGINALIA
                    out_regions.append([rt, rband, rfirst, col, col_spans])
                continue
            for k, i in enumerate(lids):
                sx.append(k)
                sy.append(int(lead[i]))
            spans = [strip_span(i) for i in lids if slen[i] > 0]
            if spans:
                out_regions.append([RT_TEXT, rband, rfirst, 0, spans])
        else:
            spans = [strip_span(i) for i in lids if slen[i] > 0]
            if spans:
                out_regions.append([rtype, rband, rfirst, _c, spans])

    slope = 0.0
    if len(sx) >= 2:
        ax = np.asarray(sx, dtype=np.float64)
        ay = np.asarray(sy, dtype=np.float64)
        mx = ax.sum() / len(ax)
        my = ay.sum() / len(ay)
        dx = ax - mx
        var = float((dx * dx).sum())
        if var > 0:
            slope = float((dx * (ay - my)).sum()) / var

    # §7 reading order; §7p: page-column mode orders column-major
    # ACROSS bands (all of column 0 top-down, then column 1, ...)
    tg = {RT_HEADER: 0, RT_TEXT: 1, RT_TOOL: 1, RT_TABLE: 1, "dropcap": 1, RT_MARGINALIA: 2, RT_SEPARATOR: 3}
    if page_gutters is not None:
        out_regions.sort(key=lambda r: (r[3], r[1], tg[r[0]], r[2]))
    else:
        out_regions.sort(key=lambda r: (r[1], tg[r[0]], r[2], r[3]))

    # §8 drop-capital merge
    merged = []
    i = 0
    while i < len(out_regions):
        r = out_regions[i]
        if (
            r[0] == "dropcap"
            and i + 1 < len(out_regions)
            and out_regions[i + 1][0] == RT_TEXT
            and out_regions[i + 1][1] == r[1]
            and out_regions[i + 1][4]
        ):
            tgt = out_regions[i + 1]
            dcs = r[4][0][0]
            dtext = r[4][0][2]
            fcs, fce, ftext, fca, fcb = tgt[4][0]
            # merged span keeps the TARGET's column range (col ranges
            # are per-line; the dropcap sits on its own line)
            tgt[4][0] = (dcs, fce, dtext + ftext, fca, fcb)
            merged.append(tgt)
            i += 2
            continue
        if r[0] == "dropcap":
            r[0] = RT_DROPCAP
        merged.append(r)
        i += 1

    # §9 small-fragment adherence: overlap-argmax (the pairwise
    # small-x-big overlap matrix of utils/__init__.py:923-948 in 1-D) —
    # each fragment merges into the big span with maximal column
    # overlap; ties break to the index-nearest, then earliest, big.
    final_regions = []
    for r in merged:
        if r[0] != RT_TEXT:
            final_regions.append(r)
            continue
        spans_r = r[4]
        if cfg.enable_line_split:
            spans_r = _split_long_spans(spans_r, cfg)  # §9L (-cl mode)
        bigs = [
            j for j, sp in enumerate(spans_r)
            if len(sp[2]) > cfg.small_fragment_max_len
        ]
        if not bigs:
            if spans_r:
                final_regions.append(r)
            continue
        pre = {j: [] for j in bigs}
        suf = {j: [] for j in bigs}
        for j, sp in enumerate(spans_r):
            if len(sp[2]) > cfg.small_fragment_max_len:
                continue
            best, bo, bd = bigs[0], -1, None
            for i in bigs:
                b = spans_r[i]
                ov = max(0, min(sp[4], b[4]) - max(sp[3], b[3]))
                dist = abs(j - i)
                if ov > bo or (ov == bo and dist < bd):
                    best, bo, bd = i, ov, dist
            (pre if j < best else suf)[best].append(sp)
        out_spans = []
        for i in bigs:
            cs, ce, text, ca, cb = spans_r[i]
            if pre[i]:
                text = " ".join(p[2] for p in pre[i]) + " " + text
                cs = pre[i][0][0]
            if suf[i]:
                text = text + " " + " ".join(p[2] for p in suf[i])
                ce = suf[i][-1][1]
            out_spans.append((cs, ce, text, ca, cb))
        r[4] = out_spans
        final_regions.append(r)

    # §10 emission
    spans = []
    for rs, r in enumerate(final_regions):
        for sp in r[4]:
            spans.append((len(spans), r[0], rs, sp[0], sp[1], sp[2]))
    return diag_or_spans(spans, len(final_regions), max_cols, slope)


# integerized gaussian weights per sigma (shared by spec with the
# oracle: radius int(3s+0.5), w[k] = round(1e6 * exp(-k^2 / 2s^2)))
_GAUSS_CACHE: dict = {}


def _gauss_weights(sigma: float):
    got = _GAUSS_CACHE.get(sigma)
    if got is None:
        import math

        r = int(3.0 * sigma + 0.5)
        got = (
            r,
            [
                round(1_000_000 * math.exp(-(k * k) / (2.0 * sigma * sigma)))
                for k in range(-r, r + 1)
            ],
        )
        _GAUSS_CACHE[sigma] = got
    return got


def _smooth_profile(profile: np.ndarray, sigma: float) -> np.ndarray:
    """Integer gaussian smoothing (gaussian_filter1d analog,
    utils/__init__.py:377-383): zero-padded convolution with the
    integerized kernel — exact arithmetic, so the naive oracle's loop
    produces bit-identical values."""
    r, wts = _gauss_weights(sigma)
    w = len(profile)
    sm = np.zeros(w, dtype=np.int64)
    for k in range(-r, r + 1):
        wt = wts[k + r]
        if k == 0:
            sm += wt * profile
        elif k > 0:
            if k < w:
                sm[: w - k] += wt * profile[k:]
        else:
            if -k < w:
                sm[-k:] += wt * profile[: w + k]
    return sm


def _select_gutters(profile: np.ndarray, cfg: ExtractConfig):
    """SPEC §6 valley machinery over an ink profile: smoothed
    relative-depth valleys with stray tolerance and deepest-first
    suppression (find_num_col + find_peaks analog,
    utils/__init__.py:443-503, separate_lines.py:57-103)."""
    w = len(profile)
    if w < 2:
        return []
    # cheap structural pre-pass first: smoothing only runs when at
    # least one run survives width/zero-anchor/position checks. A
    # vectorized quick-reject (a qualifying run exists IFF some zero
    # column has a <= stray neighbor) bails before any run extraction
    # — most profiles reaching here (e.g. every sheared profile of a
    # skewed single-column paragraph) have no such pair.
    stray = cfg.gutter_max_stray_lines
    pv = np.asarray(profile)
    z = pv == 0
    if not z.any():
        return []
    low = pv <= stray
    if not ((z[:-1] & low[1:]) | (z[1:] & low[:-1])).any():
        return []
    # run extraction stays a pure-python scan: profiles are tiny and
    # the numpy run-extraction chain (diff/flatnonzero/concat/cumsum)
    # costs more in per-call dispatch than the loop saves
    pv_l = pv.tolist()
    lo_c = cfg.gutter_min_frac * w
    hi_c = cfg.gutter_max_frac * w
    pre = []
    p = 0
    while p < w:
        if pv_l[p] <= stray:
            q = p
            has0 = pv_l[p] == 0
            while q + 1 < w and pv_l[q + 1] <= stray:
                q += 1
                has0 = has0 or pv_l[q] == 0
            if q - p + 1 >= 2 and has0 and lo_c <= (p + q) // 2 <= hi_c:
                pre.append((p, q))
            p = q + 1
        else:
            p += 1
    if not pre:
        return []
    sm = _smooth_profile(profile, cfg.gutter_sigma)
    max_s = int(sm.max())
    if max_s == 0:
        return []
    rel_pct = int(round(cfg.gutter_rel_depth * 100))
    peak_pct = int(round(cfg.gutter_peak_frac * 100))
    kept = []
    for a, b in pre:
        depth = int(sm[a : b + 1].min())
        if depth * 100 > rel_pct * max_s:
            continue  # valley not deep enough relative to the peak
        # two-sided prominence: a real gutter separates two ink PEAKS;
        # the ragged tail of a block (only the longest line inks) has
        # no right-side peak and is rejected
        left_max = int(sm[:a].max()) if a > 0 else 0
        right_max = int(sm[b + 1 :].max()) if b + 1 < w else 0
        if min(left_max, right_max) * 100 < peak_pct * max_s:
            continue
        kept.append((depth, a, b))
    # W6 suppression: keep the deepest max_columns-1 valleys, then
    # restore positional order
    kept.sort()
    kept = kept[: cfg.max_columns - 1]
    kept.sort(key=lambda t: t[1])
    return [(a, b) for _, a, b in kept]


def _select_gutters_batch(prof_grid: np.ndarray, widths, cfg: ExtractConfig):
    """Batched `_select_gutters` over a (m, W) int64 profile grid whose
    rows are zero-padded past each block's true width. Returns one
    gutter list per row, bit-identical to
    ``_select_gutters(prof_grid[r, :widths[r]], cfg)`` — the A/B fuzz
    in tests/test_kernel_oracle.py asserts this. All stages (run
    extraction, gaussian smoothing, depth/prominence) run as grid ops;
    only the final W6 per-row suppression walks survivors in Python."""
    m, W = prof_grid.shape
    out: list[list] = [[] for _ in range(m)]
    if m == 0 or W < 2:
        return out
    stray = cfg.gutter_max_stray_lines
    wds = np.asarray(widths, dtype=np.int64)
    colx = np.arange(W, dtype=np.int64)[None, :]
    inw = colx < wds[:, None]
    z = (prof_grid == 0) & inw
    low = (prof_grid <= stray) & inw
    # quick reject (scalar parity): a qualifying run exists only if
    # some zero column has a <= stray neighbor
    cand = ((z[:, :-1] & low[:, 1:]) | (z[:, 1:] & low[:, :-1])).any(axis=1)
    rows = np.flatnonzero(cand)
    if not len(rows):
        return out
    # maximal low-runs per row: pad one False column per row so runs
    # never span row boundaries in the flattened view
    lowp = np.zeros((len(rows), W + 1), dtype=bool)
    lowp[:, :W] = low[rows]
    flat = lowp.reshape(-1)
    d = np.diff(flat.astype(np.int8))
    rstart = np.flatnonzero(d == 1) + 1
    if flat[0]:
        rstart = np.concatenate([np.zeros(1, np.int64), rstart])
    rend = np.flatnonzero(d == -1)  # inclusive run ends (pad col closes all)
    blk = rstart // (W + 1)
    a = rstart - blk * (W + 1)
    b = rend - blk * (W + 1)
    # scalar filters: width >= 2, contains a zero, center within frac
    # bounds of the block's true width (float compare, as scalar)
    keep = (b - a) >= 1
    zc = np.cumsum(z[rows], axis=1)
    zin = zc[blk, b] - np.where(a > 0, zc[blk, np.maximum(a - 1, 0)], 0)
    keep &= zin > 0
    mid = (a + b) // 2
    wr = wds[rows]
    keep &= (mid >= cfg.gutter_min_frac * wr[blk]) & (
        mid <= cfg.gutter_max_frac * wr[blk]
    )
    if not keep.any():
        return out
    blk = blk[keep]
    a = a[keep]
    b = b[keep]
    srows = np.unique(blk)  # indices into `rows` that still need smoothing
    rix = np.searchsorted(srows, blk)
    # batched integer gaussian smoothing: beyond-width entries are zero
    # by construction, so convolving the padded row equals the scalar
    # zero-padded convolution on [0, w)
    r, wts = _gauss_weights(cfg.gutter_sigma)
    P = prof_grid[rows[srows]]
    sm = wts[r] * P
    for k in range(1, r + 1):
        if k < W:
            sm[:, : W - k] += wts[r + k] * P[:, k:]
            sm[:, k:] += wts[r - k] * P[:, : W - k]
    sm_in = np.where(colx < wds[rows[srows], None], sm, 0)
    max_s = sm_in.max(axis=1)
    fmax = np.maximum.accumulate(sm_in, axis=1)
    bmax = np.maximum.accumulate(sm_in[:, ::-1], axis=1)[:, ::-1]
    # per-run depth via 1-D reduceat over the flattened smoothed grid
    # (sentinel keeps end == len legal); runs are disjoint and sorted
    sm_flat = np.concatenate([sm_in.reshape(-1), np.zeros(1, np.int64)])
    inter = np.empty(2 * len(a), dtype=np.int64)
    inter[0::2] = rix * W + a
    inter[1::2] = rix * W + b + 1
    depth = np.minimum.reduceat(sm_flat, inter)[0::2]
    left = np.where(a > 0, fmax[rix, np.maximum(a - 1, 0)], 0)
    right = np.where(b + 1 < W, bmax[rix, np.minimum(b + 1, W - 1)], 0)
    ms = max_s[rix]
    rel_pct = int(round(cfg.gutter_rel_depth * 100))
    peak_pct = int(round(cfg.gutter_peak_frac * 100))
    ok = (
        (ms > 0)
        & (depth * 100 <= rel_pct * ms)
        & (np.minimum(left, right) * 100 >= peak_pct * ms)
    )
    if not ok.any():
        return out
    # W6 suppression per row: deepest max_columns-1, positional order
    sel = np.flatnonzero(ok)
    order = np.lexsort((b[sel], a[sel], depth[sel], blk[sel]))
    sel = sel[order]
    kmax = cfg.max_columns - 1
    cur = -1
    taken = 0
    buf: list = []
    for i in sel:
        rblk = int(blk[i])
        if rblk != cur:
            if buf:
                buf.sort()
                out[int(rows[cur])] = buf
            cur = rblk
            taken = 0
            buf = []
        if taken < kmax:
            buf.append((int(a[i]), int(b[i])))
            taken += 1
    if buf:
        buf.sort()
        out[int(rows[cur])] = buf
    return out


def _ls_slope_int(leads) -> tuple[int, int]:
    """Least-squares slope of leading indent vs line index as an exact
    integer fraction (numerator A, denominator B): slope = A/B.
    cv2.fitLine analog (utils/__init__.py:331-332)."""
    n = len(leads)
    sk = n * (n - 1) // 2
    sk2 = (n - 1) * n * (2 * n - 1) // 6
    sy = 0
    sky = 0
    for k in range(n):
        y = int(leads[k])
        sy += y
        sky += k * y
    return n * sky - sk * sy, n * sk2 - sk * sk


def _choose_shear(ink_rows, lens, leads, cfg: ExtractConfig, nz=None):
    """SPEC §6d deskew: shear-grid argmax (return_deskew_slop analog,
    separate_lines.py:1605-1646, in 1-D). Candidates are the LS slope's
    neighborhood plus 0; each candidate de-indents line k by
    round(s*k) (normalized to min 0) and scores the sheared ink
    profile's normalized variance (sharper columns = higher variance);
    the first candidate with maximal score wins. Returns
    (s_star, shifts, sheared_profile) when |s_star| >= slope_threshold,
    else None."""
    A, B = _ls_slope_int(leads)
    if B <= 0 or abs(A) < cfg.slope_threshold * B:
        return None
    sls = A / B
    n = len(lens)
    cands = [0.0, sls - 0.5, sls - 0.25, sls, sls + 0.25, sls + 0.5]
    lens_i = [int(lens[k]) for k in range(n)]
    lens_a = np.asarray(lens_i, dtype=np.int64)
    ks = np.arange(n, dtype=np.float64)
    # flatten the block's ink cells ONCE (row, col of every inked
    # position, masked by each line's true length — rows may be padded
    # when they come from a fixed-width grid); each candidate's
    # sheared profile is then a single bincount of (col - shift[row])
    # instead of a per-line slice-add loop
    if nz is not None:
        # precomputed (row, col) ink coordinates, already length-masked
        rows_nz, cols_nz = nz
    elif isinstance(ink_rows, np.ndarray) and ink_rows.ndim == 2:
        rows_nz, cols_nz = np.nonzero(ink_rows)
        valid = cols_nz < lens_a[rows_nz]
        rows_nz = rows_nz[valid]
        cols_nz = cols_nz[valid]
    else:
        rl, cl = [], []
        for k in range(n):
            nz = np.flatnonzero(ink_rows[k][: lens_i[k]])
            cl.append(nz)
            rl.append(np.full(len(nz), k, dtype=np.int64))
        rows_nz = np.concatenate(rl) if rl else np.zeros(0, dtype=np.int64)
        cols_nz = (
            np.concatenate(cl).astype(np.int64) if cl else np.zeros(0, np.int64)
        )
    # candidates with identical shift vectors score identically, so
    # build each distinct shift vector's profile once (short blocks
    # collapse most of the grid)
    # np.rint == Python round on doubles (both half-to-even), so the
    # shift vectors are bit-identical to a scalar round() loop.
    # Candidates with identical shift vectors score identically, so
    # distinct vectors are profiled once — and ALL distinct profiles
    # come from ONE offset-bincount over the flattened ink cells.
    raw_all = np.rint(np.asarray(cands)[:, None] * ks[None, :]).astype(np.int64)
    sh_all = raw_all - raw_all.min(axis=1, keepdims=True)
    seen: dict[bytes, int] = {}
    cand_slot = []  # candidate index -> distinct-vector slot
    slots = []
    for ci in range(len(cands)):
        key = sh_all[ci].tobytes()
        slot = seen.get(key)
        if slot is None:
            slot = len(slots)
            seen[key] = slot
            slots.append(ci)
        cand_slot.append(slot)
    dist = sh_all[slots]  # (m, n)
    wps = (lens_a[None, :] - dist).max(axis=1)
    m = len(slots)
    wmax = int(wps.max()) if m else 0
    if wmax <= 0:
        return None
    # per-line col-shift: idx < (len - sh) <= wp for every inked cell,
    # so slot c's counts all land inside its own [c*wmax, c*wmax+wp_c)
    idx = cols_nz[None, :] - dist[:, rows_nz]
    ok = idx >= 0
    flat = (np.arange(m, dtype=np.int64)[:, None] * wmax + idx)[ok]
    profs = np.bincount(flat, minlength=m * wmax).reshape(m, wmax)
    svs = profs.sum(axis=1)
    sv2s = np.einsum("ij,ij->i", profs, profs)
    best = None  # (score, wp, s, slot)
    for ci, s in enumerate(cands):
        slot = cand_slot[ci]
        wp = int(wps[slot])
        if wp <= 0:
            continue
        score = wp * int(sv2s[slot]) - int(svs[slot]) ** 2  # pop var * wp^2
        if best is None or score * best[1] * best[1] > best[0] * wp * wp:
            best = (score, wp, s, slot)
    if best is None or abs(best[2]) < cfg.slope_threshold:
        return None
    slot = best[3]
    return best[2], dist[slot].tolist(), profs[slot, : best[1]]


def _choose_shear_batch(specs, cfg: ExtractConfig):
    """Batched `_choose_shear` over many blocks at once. ``specs`` is a
    list of (A, B, lens, rows_loc, cols_loc) per block — A/B the EXACT
    integer LS-slope fraction (python ints, so sls = A/B is the same
    correctly-rounded double the scalar path computes), lens the line
    lengths, rows/cols the length-masked ink coordinates. Returns one
    scalar-path-identical result per block: the entire candidate grid
    (6 per block) shears through ONE rint, ONE offset bincount and ONE
    einsum; only the 6-way winner comparison (python ints — the
    rational cross-product can exceed int64) walks blocks in Python.
    A/B-fuzzed against the scalar path in tests/test_kernel_oracle.py."""
    nb = len(specs)
    if nb == 0:
        return []
    C = 6
    n_b = np.asarray([len(sp[2]) for sp in specs], dtype=np.int64)
    offs = np.cumsum(n_b) - n_b
    ktot = int(n_b.sum())
    k_flat = np.arange(ktot, dtype=np.int64) - np.repeat(offs, n_b)
    lens_flat = np.concatenate([np.asarray(sp[2], dtype=np.int64) for sp in specs])
    sls_list = [sp[0] / sp[1] for sp in specs]  # exact-int true division
    s_arr = np.empty((nb, C), dtype=np.float64)
    for b, sls in enumerate(sls_list):
        s_arr[b] = (0.0, sls - 0.5, sls - 0.25, sls, sls + 0.25, sls + 0.5)
    # shift vectors: rint(s*k), normalized so the block minimum is 0.
    # rint of a monotone sequence is monotone, so the minimum is
    # min(rint(s*0)=0, rint(s*(n-1))) in closed form.
    s_line = np.repeat(s_arr, n_b, axis=0).T  # (C, ktot)
    raw = np.rint(s_line * k_flat.astype(np.float64)[None, :]).astype(np.int64)
    m_last = np.rint(s_arr * (n_b - 1)[:, None].astype(np.float64)).astype(np.int64)
    min0 = np.minimum(0, m_last)  # (nb, C)
    sh = raw - np.repeat(min0, n_b, axis=0).T  # (C, ktot)
    # wp per (block, cand): max over the block's lines of len - shift
    sent = np.full(1, -(1 << 60), dtype=np.int64)
    wps = np.empty((nb, C), dtype=np.int64)
    for c in range(C):
        wps[:, c] = np.maximum.reduceat(
            np.concatenate([lens_flat - sh[c], sent]), offs
        )[:nb] if ktot else 0
    W = int(lens_flat.max()) if ktot else 0
    if W <= 0:
        return [None] * nb
    # ink coordinates flattened across blocks
    blk_cells = []
    line_off = offs
    rows_g = []
    cols_g = []
    for b, sp in enumerate(specs):
        r, c_ = sp[3], sp[4]
        rows_g.append(np.asarray(r, dtype=np.int64) + line_off[b])
        cols_g.append(np.asarray(c_, dtype=np.int64))
        blk_cells.append(np.full(len(r), b, dtype=np.int64))
    rows_g = np.concatenate(rows_g) if rows_g else np.zeros(0, np.int64)
    cols_g = np.concatenate(cols_g) if cols_g else np.zeros(0, np.int64)
    blk_cells = np.concatenate(blk_cells) if blk_cells else np.zeros(0, np.int64)
    # one offset bincount: slot (b, c) owns [ (b*C+c)*W, ...+wp_bc )
    idx = cols_g[None, :] - sh[:, rows_g]  # (C, nnz)
    ok = idx >= 0
    base = blk_cells * (C * W)
    flat = (base[None, :] + (np.arange(C, dtype=np.int64) * W)[:, None] + idx)[ok]
    profs = np.bincount(flat, minlength=nb * C * W).reshape(nb * C, W)
    svs = profs.sum(axis=1)
    sv2s = np.einsum("ij,ij->i", profs, profs)
    out = []
    for b in range(nb):
        best = None  # (score, wp, s, c)
        for c in range(C):
            wp = int(wps[b, c])
            if wp <= 0:
                continue
            slot = b * C + c
            score = wp * int(sv2s[slot]) - int(svs[slot]) ** 2
            if best is None or score * best[1] * best[1] > best[0] * wp * wp:
                best = (score, wp, float(s_arr[b, c]), c)
        if best is None or abs(best[2]) < cfg.slope_threshold:
            out.append(None)
            continue
        c = best[3]
        lo, hi = int(offs[b]), int(offs[b] + n_b[b])
        out.append(
            (best[2], sh[c, lo:hi].tolist(), profs[b * C + c, : best[1]])
        )
    return out


def _ink_row(s: str) -> np.ndarray:
    """Boolean ink mask of one raw line (char != ' '; NUL is ink)."""
    if not s:
        return np.zeros(0, dtype=bool)
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32) != 32


def _find_gutters(raw, rlen, lids, cfg: ExtractConfig):
    """SPEC §6 gutters, numpy ink profile over the block."""
    contiguous = isinstance(lids, range) and lids.step == 1
    if contiguous:
        w = int(rlen[lids.start : lids.stop].max()) if len(lids) else 0
    else:
        w = int(max(rlen[i] for i in lids))
    if w == 0:
        return []
    if contiguous:
        # numpy's fixed-width unicode dtype IS a UTF-32 grid: one
        # astype over just this block yields per-char codes (0-padded
        # past each line's end) — no per-line encodes, no global grid
        blk = raw[lids.start : lids.stop]
        grid = blk.astype(f"U{w}").view(np.uint32).reshape(len(blk), w)
        # padding past each line's end is masked by LENGTH, not by code
        # 0 — a literal NUL character inside text is ink (matches the
        # oracle's `ch != ' '` and the non-contiguous fallback)
        lens = rlen[lids.start : lids.stop]
        valid = np.arange(w, dtype=np.int64)[None, :] < lens[:, None]
        profile = ((grid != 32) & valid).sum(axis=0)
    else:
        profile = np.zeros(w, dtype=np.int64)
        for i in lids:
            s = raw[i]
            if s.isascii():
                a = np.frombuffer(s.encode(), dtype=np.uint8)
            else:
                a = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
            if len(a):
                profile[: len(a)] += a != 32
    return _select_gutters(profile, cfg)
