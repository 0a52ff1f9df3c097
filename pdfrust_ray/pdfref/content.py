"""Content-stream interpreter and text assembly.

Pins /root/reference/src/content.rs:
  - operand tokens buffer until an operator keyword arrives; inline
    dictionaries are skipped to DictEnd (content.rs:234-241); unknown
    operators are logged-and-ignored WITHOUT clearing the operand
    buffer (content.rs:624-628) — quirk kept; non-operand tokens
    (comments, stray DictEnd, stream keywords) panic
    (content.rs:630).
  - graphics/text state per content.rs:637-717 (th defaults to
    Real(1.0), tc/tw/tl Integer(0)); q/Q push/pop (pop on empty
    panics); BT resets Tm/Tlm to identity (content.rs:171-173).
  - Td premultiplies a translation into Tlm then copies to Tm
    (content.rs:179-183); TD sets tl = -ty first (content.rs:185-188);
    T* = Td(0, tl) (content.rs:218-220); Td with arity != 2 is
    skipped (content.rs:506-509).
  - text assembly (content.rs:719-952):
      * "\\n" emitted iff Tm.ty (f32) changed since the previous show
        op (content.rs:747-750, 777-781);
      * Tj pushes raw bytes as chars with NO CMap lookup
        (content.rs:752-765); Tj requires buf[0] to be a literal
        string (content.rs:589-592);
      * TJ with a CMap assembles 1- or 2-byte codes, missing code
        panics (content.rs:800-803); without a CMap, bytes as chars;
      * advance math: tx = (w0*tfs + tc [+ tw if code byte == b' '])
        * th; Tm = translate(tx,0) * Tm (content.rs:818-855); width
        lookup uses the HIGH byte of a 2-byte code (content.rs:818);
      * kerning numbers translate by -tj/1000*tfs*th and insert NO
        space (the heuristic is commented out, content.rs:929-942);
      * fonts resolved per show op; missing font name or no Tf panics
        (content.rs:738-744);
      * final output trims leading '\\n' and ' ' only
        (content.rs:950).
  - chars mode emits "{char:?}, {subtype:?}, {basefont:?}, {tm}\\n"
    per glyph (content.rs:753-761, 805-813) with Rust Debug/Display
    formatting.
"""

from __future__ import annotations

import numpy as _np

from .errors import ParseError
from .numbers import Matrix, Number, f32, rust_char_debug, rust_str_debug
from .tokenizer import (
    ARR_BEGIN,
    ARR_END,
    DICT_BEGIN,
    DICT_END,
    HEX,
    LIT,
    NAME,
    NUM,
    STR,
    Tokenizer,
)

_SPACE = 0x20


class TextState:
    __slots__ = ("tc", "tw", "th", "tl", "tf", "tfs", "tmode")

    def __init__(self):
        self.tc = Number.int(0)
        self.tw = Number.int(0)
        self.th = Number.real(1.0)
        self.tl = Number.int(0)
        self.tf = None
        self.tfs = None
        self.tmode = Number.int(0)

    def copy(self):
        s = TextState.__new__(TextState)
        s.tc, s.tw, s.th, s.tl, s.tf, s.tfs, s.tmode = (
            self.tc,
            self.tw,
            self.th,
            self.tl,
            self.tf,
            self.tfs,
            self.tmode,
        )
        return s


class GraphicsState:
    __slots__ = ("ctm", "text_state", "line_width", "line_cap", "flatness")

    def __init__(self):
        self.ctm = Matrix()
        self.text_state = TextState()
        self.line_width = Number.real(1.0)
        self.line_cap = Number.int(0)
        self.flatness = Number.real(1.0)

    def copy(self):
        g = GraphicsState.__new__(GraphicsState)
        g.ctm = self.ctm
        g.text_state = self.text_state.copy()
        g.line_width = self.line_width
        g.line_cap = self.line_cap
        g.flatness = self.flatness
        return g


class TextContent:
    """Interpreter state + the get_text() reduction."""

    def __init__(self, content_bytes: bytes, resources, enable_xobjects: bool = False):
        self.resources = resources
        self.tok = Tokenizer(content_bytes, 0)
        self.gs = GraphicsState()
        self.gs_stack: list[GraphicsState] = []
        self.tm = Matrix()
        self.tlm = Matrix()
        # spec-mode Form XObject recursion (`Do`): the reference parses
        # and IGNORES Do (content.rs:615-620) — parity default keeps
        # that; with enable_xobjects=True the form's content stream is
        # expanded INLINE (tokenizer stack), sharing graphics/text state
        # with the invoking stream, with the form's own /Resources (if
        # any) active inside it.
        self.xobj_enabled = enable_xobjects
        self.tok_stack: list = []

    # --- state processors (content.rs:122-221) ---
    def _process_td(self, tx: Number, ty: Number):
        self.tlm = Matrix(1.0, 0.0, 0.0, 1.0, tx.as_f32(), ty.as_f32()) * self.tlm
        self.tm = self.tlm

    def _need_num(self, buf, i, op):
        if i >= len(buf):
            raise ParseError("Content", f"missing operand {i} for operator {op}")
        t = buf[i]
        if t[0] != NUM:
            raise ParseError("Content", f"Operand {t!r} is not allowed with operator {op}")
        return t[1]

    def _need_name(self, buf, i, op):
        if i >= len(buf):
            raise ParseError("Content", f"missing operand {i} for operator {op}")
        t = buf[i]
        if t[0] != NAME:
            raise ParseError("Content", f"Operand {t!r} is not allowed with operator {op}")
        return t[1]

    def next_instruction(self):
        """One GraphicsInstruction, or None at end (content.rs:223-635)."""
        buf = []
        while True:
            t = self.tok.next()
            if t is None:
                if self.tok_stack:
                    # end of a Form XObject stream: resume the invoker
                    self.tok, self.resources = self.tok_stack.pop()
                    continue
                return None
            kind = t[0]
            if kind in (LIT, NAME, ARR_BEGIN, ARR_END, HEX, NUM):
                buf.append(t)
                continue
            if kind == DICT_BEGIN:
                while True:
                    t2 = self.tok.next()
                    if t2 is None or t2[0] == DICT_END:
                        break
                continue
            if kind != STR:
                raise ParseError(
                    "Content", f"Pdf token {t!r} has no mapping implemented to ContentStream"
                )
            op = t[1]
            if op == b"q":
                self.gs_stack.append(self.gs.copy())
                return ("q",)
            if op == b"Q":
                if not self.gs_stack:
                    raise ParseError("Content", "Unable to restore graphic state from empty stack")
                self.gs = self.gs_stack.pop()
                return ("Q",)
            if op == b"cm":
                vals = [self._need_num(buf, i, "re") for i in range(6)]
                self.gs.ctm = Matrix(*(v.as_f32() for v in vals))
                return ("cm",)
            if op == b"w":
                self.gs.line_width = self._need_num(buf, 0, "J")
                return ("w",)
            if op == b"J":
                self.gs.line_cap = self._need_num(buf, 0, "J")
                return ("J",)
            if op == b"d":
                if not buf or buf[0][0] != ARR_BEGIN:
                    raise ParseError("Content", "First operand is not allowed for operator d")
                return ("d",)
            if op == b"i":
                self.gs.flatness = self._need_num(buf, 0, "re")
                return ("i",)
            if op == b"gs":
                self._need_name(buf, 0, "gs")
                return ("gs",)
            if op == b"m":
                self._need_num(buf, 0, "re")
                self._need_num(buf, 1, "re")
                return ("m",)
            if op == b"l":
                self._need_num(buf, 0, "re")
                self._need_num(buf, 1, "re")
                return ("l",)
            if op == b"c":
                for i in range(6):
                    self._need_num(buf, i, "Tm")
                return ("c",)
            if op == b"h":
                return ("h",)
            if op == b"re":
                for i in range(4):
                    self._need_num(buf, i, "re")
                return ("re",)
            if op in (b"W", b"W*", b"S", b"f", b"f*", b"n"):
                return (op.decode(),)
            if op == b"cs":
                self._need_name(buf, 0, "cs")
                return ("cs",)
            if op == b"sc":
                self._need_num(buf, 0, "cs")
                return ("sc",)
            if op in (b"G", b"g"):
                self._need_num(buf, 0, "G")
                return (op.decode(),)
            if op in (b"RG", b"rg"):
                for i in range(3):
                    self._need_num(buf, i, "rg")
                return (op.decode(),)
            if op == b"BT":
                self.tm = Matrix()
                self.tlm = Matrix()
                return ("BT",)
            if op == b"ET":
                return ("ET",)
            if op == b"TD":
                tx = self._need_num(buf, 0, "TD")
                ty = self._need_num(buf, 1, "TD")
                self.gs.text_state.tl = -ty
                self._process_td(tx, ty)
                return ("TD",)
            if op == b"Td":
                if len(buf) != 2:
                    return self.next_instruction()  # content.rs:506-509
                tx = self._need_num(buf, 0, "TD")
                ty = self._need_num(buf, 1, "TD")
                self._process_td(tx, ty)
                return ("Td",)
            if op == b"Tc":
                self.gs.text_state.tc = self._need_num(buf, 0, "TD")
                return ("Tc",)
            if op == b"Tf":
                font = self._need_name(buf, 0, "TD")
                size = self._need_num(buf, 1, "TD")
                self.gs.text_state.tf = font
                self.gs.text_state.tfs = size
                return ("Tf",)
            if op == b"Tr":
                self.gs.text_state.tmode = self._need_num(buf, 0, "Tr")
                return ("Tr",)
            if op == b"Tm":
                vals = [self._need_num(buf, i, "Tm") for i in range(6)]
                comps = tuple(v.as_f32() for v in vals)
                self.tm = Matrix(*comps)
                self.tlm = Matrix(*comps)
                return ("Tm",)
            if op == b"T*":
                self._process_td(Number.int(0), self.gs.text_state.tl)
                return ("T*",)
            if op == b"Tj":
                if not buf:
                    raise ParseError("Content", "missing operand for operator Tj")
                if buf[0][0] != LIT:
                    raise ParseError(
                        "Content", f"Operand {buf[0]!r} is not allowed with operator Tj"
                    )
                return ("Tj", buf[0][1])
            if op == b"TJ":
                items = []
                for tk in buf:
                    if tk[0] in (LIT, HEX):
                        items.append(("text", tk[1]))
                    elif tk[0] == NUM:
                        items.append(("pos", tk[1]))
                return ("TJ", items)
            if op == b"Do":
                name = self._need_name(buf, 0, "Do")
                if self.xobj_enabled:
                    resolver = getattr(self.resources, "resolve_form_xobject", None)
                    target = resolver(name) if resolver is not None else None
                    if target is not None:
                        if len(self.tok_stack) >= 16:
                            raise ParseError("Content", "Form XObject nesting too deep")
                        data, form_res = target
                        self.tok_stack.append((self.tok, self.resources))
                        self.tok = Tokenizer(data, 0)
                        if form_res is not None:
                            self.resources = form_res
                return ("Do", name)
            if op in (b"BDC", b"BMC", b"EMC"):
                return (op.decode(),)
            # unknown operator: logged and ignored, buf KEPT (content.rs:624-628)
            continue

    # --- text assembly (content.rs:732-951) ---
    def _font(self):
        ts = self.gs.text_state
        if ts.tf is None:
            raise ParseError("Content", "Text state should have a font set")
        fm = self.resources.font
        if fm is None:
            raise ParseError("Content", f"Fontmap does not contains the font name {ts.tf!r}")
        font = fm.fonts.get(ts.tf)
        if font is None:
            raise ParseError("Content", f"font {ts.tf!r} not in fontmap")
        return font

    def _tfs(self):
        tfs = self.gs.text_state.tfs
        if tfs is None:
            raise ParseError("Content", "Font size should be set before painting a glyph")
        return tfs

    def _advance(self, font, code_byte: int):
        """Glyph advance (content.rs:818-855 / 874-910).

        Hot loop: identical f32-rounded math to the Number/Matrix path
        (w0*tfs+tc [+tw] then *th; translate(tx,0)*Tm touches only e,f:
        e' = f32(f32(tx*a)+e), f' = f32(f32(tx*b)+f)), but on raw floats
        — corpus chars-mode parity pins the equivalence.
        """
        w0 = font.width_f32(code_byte)
        ts = self.gs.text_state
        tfs = self._tfs()
        tx = f32(w0 * tfs.as_f32())
        tx = f32(tx + ts.tc.as_f32())
        if code_byte == _SPACE:
            tx = f32(tx + ts.tw.as_f32())
        tx = f32(tx * ts.th.as_f32())
        tm = self.tm
        new = tm.copy()
        new.e = f32(f32(tx * tm.a) + tm.e)
        new.f = f32(f32(tx * tm.b) + tm.f)
        self.tm = new

    def _char_line(self, ch: str, font) -> str:
        return (
            f"{rust_char_debug(ch)}, {rust_str_debug(font.subtype)}, "
            f"{rust_str_debug(font.base_font)}, {self.tm.rust_display()}\n"
        )

    def get_text(self, display_char: bool) -> str:
        self._adv_cache: dict = {}
        out = []
        tm_prev_ty = self.tm.get_ty()
        while True:
            try:
                ins = self.next_instruction()
                if ins is None:
                    break
                kind = ins[0]
                if kind == "Tj":
                    font = self._font()
                    if self.tm.get_ty() != tm_prev_ty:
                        out.append("\n")
                    tm_prev_ty = self.tm.get_ty()
                    text = ins[1]
                    if display_char:
                        for c in text:
                            out.append(self._char_line(chr(c), font))
                    else:
                        out.append(text.decode("latin-1"))  # c as char, no CMap (content.rs:752-765)
                elif kind == "TJ":
                    font = self._font()
                    if self.tm.get_ty() != tm_prev_ty:
                        out.append("\n")
                    tm_prev_ty = self.tm.get_ty()
                    cmap = font.to_unicode
                    # --- hoisted invariants (glyph hot loop) ---
                    # within one TJ instruction only glyph advances and kerning
                    # run, and both touch only Tm.e/Tm.f — tfs/tc/tw/th and
                    # Tm.a/Tm.b are constant for the whole instruction. The
                    # f32-rounded op sequence is bit-identical to _advance().
                    ts = self.gs.text_state
                    if ts.tfs is None and ins[1]:
                        self._tfs()  # raises like content.rs:823-826
                    tfs_f = ts.tfs.as_f32() if ts.tfs is not None else 0.0
                    tc_f = ts.tc.as_f32()
                    tw_f = ts.tw.as_f32()
                    th_f = ts.th.as_f32()
                    tm = self.tm
                    a, b = tm.a, tm.b
                    e, f = tm.e, tm.f
                    # with the state constant, the advance tx is a pure
                    # function of the code byte (and of the kern value);
                    # skip the f update when b == 0 in text mode
                    # (f32(±0 + f) == f for every comparison the engine
                    # makes). The LUTs are cached ACROSS instructions:
                    # the delta depends only on (font, tfs, tc, tw, th,
                    # Tm.a, Tm.b), typically constant for many TJs —
                    # rebuilding 256-entry LUTs per instruction dominated
                    # the interpreter profile. Entries are only ADDED on
                    # successful width computation, so error-raising
                    # codes re-raise identically on every encounter.
                    b_zero = b == 0.0 and not display_char
                    skey = (id(font), tfs_f, tc_f, tw_f, th_f, a, b)
                    cached_state = self._adv_cache.get(skey)
                    if cached_state is None:
                        cached_state = (
                            _np.empty(256, dtype=_np.float32),
                            _np.empty(256, dtype=_np.float32),
                            _np.zeros(256, dtype=bool),
                            {},
                            {},
                        )
                        self._adv_cache[skey] = cached_state
                    lut_e, lut_f, lut_done, tx_of, kern_of = cached_state
                    cm_get = cmap.cmap.get if cmap is not None else None
                    two = cmap.is_two_bytes if cmap is not None else False
                    wcache = font.width_f32
                    # deltas collected across ALL items (text runs AND kerning
                    # numbers) of this TJ, folded by ONE accumulate at the end
                    delta_es: list = []
                    delta_fs: list = []

                    def fill_width(c):
                        """Compute the per-code advance LUT entry; raises the
                        reference's width-config error (Font: widths present
                        but FirstChar missing) exactly where the scalar walk
                        would."""
                        tx = f32(wcache(c) * tfs_f)
                        tx = f32(tx + tc_f)
                        if c == _SPACE:
                            tx = f32(tx + tw_f)
                        tx = f32(tx * th_f)
                        lut_e[c] = f32(tx * a)
                        lut_f[c] = f32(tx * b)
                        lut_done[c] = True

                    def advance_deltas(codes):
                        """(e_deltas, f_deltas) float32 arrays for a run of
                        code bytes — same f32-rounded math as the scalar
                        path, memoized in the per-instruction LUTs.

                        The width error is code-independent (width_f32 raises
                        for EVERY code when Widths is present and FirstChar
                        missing), so filling from np.unique's sorted order
                        here is emission-order-equivalent — the in-order
                        interleave that matters (CMapMiss vs Font) happens in
                        the caller's glyph loop via fill_width."""
                        missing = _np.unique(codes[~lut_done[codes]])
                        for c in missing.tolist():
                            fill_width(c)
                        return lut_e[codes], (None if b_zero else lut_f[codes])

                    def chain(start, deltas):
                        """Sequential f32 adds: s_i = f32(s_{i-1} + d_i) —
                        np.add.accumulate on a float32 array rounds every
                        partial sum to binary32, bit-identical to the
                        scalar loop (inf/NaN propagate IEEE-identically)."""
                        arr = _np.empty(len(deltas) + 1, dtype=_np.float32)
                        arr[0] = start
                        arr[1:] = deltas
                        _np.add.accumulate(arr, out=arr)
                        return float(arr[-1])

                    for item_kind, val in ins[1]:
                        if item_kind == "text":
                            if cmap is not None:
                                if not display_char:
                                    if two:
                                        whole = val[: len(val) & ~1]
                                        idxs = _np.frombuffer(whole, dtype=">u2").astype(_np.int64)
                                        code_bytes = (idxs >> 8).astype(_np.int64)
                                    else:
                                        code_bytes = _np.frombuffer(val, dtype=_np.uint8).astype(_np.int64)
                                        idxs = code_bytes
                                    chars = []
                                    # in-order per-glyph checks: cmap lookup THEN
                                    # width-LUT fill, interleaved like the scalar
                                    # walk (content.rs:800-820) — so a width-config
                                    # error on an early glyph wins over a later
                                    # CMapMiss, and a CMapMiss on an earlier
                                    # complete pair wins over the odd-trailing-byte
                                    # error
                                    for pos, char_idx in enumerate(idxs.tolist()):
                                        ch = cm_get(char_idx)
                                        if ch is None:
                                            raise ParseError(
                                                "CMapMiss",
                                                f"CMap does not contain a char with idx {char_idx}",
                                            )
                                        cb = int(code_bytes[pos])
                                        if not lut_done[cb]:
                                            fill_width(cb)
                                        chars.append(ch)
                                    if two and len(val) % 2 == 1:
                                        # the lone high byte fails next(it)
                                        # (content.rs:792-799)
                                        raise ParseError("Content", "odd bytes for two-byte CMap")
                                    out.append("".join(chars))
                                    de, df = advance_deltas(code_bytes)
                                    delta_es.append(de)
                                    if df is not None:
                                        delta_fs.append(df)
                                    continue
                                it = iter(val)
                                for c in it:
                                    if two:
                                        try:
                                            lo = next(it)
                                        except StopIteration:
                                            raise ParseError("Content", "odd bytes for two-byte CMap")
                                        char_idx = c * 256 + lo
                                    else:
                                        char_idx = c
                                    ch = cm_get(char_idx)
                                    if ch is None:
                                        raise ParseError(
                                            "CMapMiss",
                                            f"CMap does not contain a char with idx {char_idx}",
                                        )
                                    self.tm = Matrix(a, b, tm.c, tm.d, e, f)
                                    out.append(self._char_line(ch, font))
                                    cached = tx_of.get(c)
                                    if cached is None:
                                        tx = f32(wcache(c) * tfs_f)
                                        tx = f32(tx + tc_f)
                                        if c == _SPACE:
                                            tx = f32(tx + tw_f)
                                        tx = f32(tx * th_f)
                                        cached = (f32(tx * a), f32(tx * b))
                                        tx_of[c] = cached
                                    e = f32(cached[0] + e)
                                    if not b_zero:
                                        f = f32(cached[1] + f)
                            else:
                                if not display_char:
                                    out.append(val.decode("latin-1"))
                                    codes = _np.frombuffer(val, dtype=_np.uint8).astype(_np.int64)
                                    de, df = advance_deltas(codes)
                                    delta_es.append(de)
                                    if df is not None:
                                        delta_fs.append(df)
                                    continue
                                for c in val:
                                    self.tm = Matrix(a, b, tm.c, tm.d, e, f)
                                    out.append(self._char_line(chr(c), font))
                                    cached = tx_of.get(c)
                                    if cached is None:
                                        tx = f32(wcache(c) * tfs_f)
                                        tx = f32(tx + tc_f)
                                        if c == _SPACE:
                                            tx = f32(tx + tw_f)
                                        tx = f32(tx * th_f)
                                        cached = (f32(tx * a), f32(tx * b))
                                        tx_of[c] = cached
                                    e = f32(cached[0] + e)
                                    if not b_zero:
                                        f = f32(cached[1] + f)
                        else:  # kerning number (content.rs:916-943)
                            if ts.tfs is None:
                                self._tfs()  # raise exactly like the reference
                            vf = val.as_f32()
                            cached = kern_of.get(vf)
                            if cached is None:
                                tx = f32((-vf) / 1000.0)
                                tx = f32(tx * tfs_f)
                                tx = f32(tx * th_f)
                                cached = (f32(tx * a), f32(tx * b))
                                kern_of[vf] = cached
                            if display_char:
                                e = f32(cached[0] + e)
                                if not b_zero:
                                    f = f32(cached[1] + f)
                            else:
                                delta_es.append(_np.asarray([cached[0]], dtype=_np.float32))
                                if not b_zero:
                                    delta_fs.append(_np.asarray([cached[1]], dtype=_np.float32))
                    # one f32-rounded fold over the whole instruction's deltas
                    # (text-run and kerning items alike, in emission order)
                    if delta_es:
                        e = chain(e, _np.concatenate(delta_es))
                    if delta_fs:
                        f = chain(f, _np.concatenate(delta_fs))
                    new = tm.copy()
                    new.e = e
                    new.f = f
                    self.tm = new
                # all other instructions contribute no text (content.rs:947)
            except ParseError:
                # spec-mode Form XObject error containment: a form whose
                # content hits a parity panic-site (real-world forms are
                # often pure graphics exercising stricter operand quirks)
                # is ABANDONED — text collected so far is kept, all
                # nested form frames unwind, and the PAGE stream resumes
                # right after the invoking Do. Page-level errors still
                # raise (error rows), exactly as before.
                if self.tok_stack:
                    self.tok, self.resources = self.tok_stack[0]
                    self.tok_stack.clear()
                    continue
                raise
        s = "".join(out)
        return s.lstrip("\n ")
