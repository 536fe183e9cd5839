"""JPEG arithmetic entropy coding (ITU T.81 Annex D QM-coder +
Annex F §F.1.4/F.2.4 DCT statistics model) — retires the engine's
last common-ish JPEG rejection (VERDICT r11 next #8): SOF9 extended
sequential arithmetic frames now decode, and the fixture corpus can
synthesize them for the driver gate.

Everything here is public-spec knowledge: the 113-row Qe probability
estimation state machine (T.81 Table D.3, identical in T.82/JBIG),
the DECODE/RENORM interval arithmetic (Annex D flowcharts), and the
DC/AC conditioning-context layout of §F.1.4.4 (the same layout the
public libjpeg jcarith/jdarith implementations use: per-table DC
statistics of 49 bins — S0 decision tree at 4·class, X1 chain at 20,
magnitude bins at +14 — and AC statistics of 245 bins — SE/S0/SP at
3(k−1), shared X1 with SP, X2 chains at 189/217 split by the Kx
conditioning boundary).

Wire format: this engine keeps the entropy-coded-segment byte level
uniform with its Huffman path — the coder produces/consumes PLAIN
bytes, and the JPEG layer applies §B.1.1.5 byte stuffing (0xFF →
0xFF 0x00) on write and de-stuffs on read (`_split_entropy`), with
zero-bytes fed past the segment end (the convention libjpeg's
arithmetic decoder documents). Restart markers reset the coder, the
statistics and the DC predictions, per §F.1.4.1 — so each restart
segment decodes with fresh state.

Scale shape: pure per-block integer state machine inside the same
Arrow ``mapInPandas`` task as the rest of the media family — no
shuffle, stateless across rows, linear in coded bytes.
"""

from __future__ import annotations

# T.81 Table D.3: Qe value, Next_Index_MPS, Next_Index_LPS, Switch_MPS.
# Row 113 is the non-adaptive "fixed" 0.5-probability bin used for AC
# sign decisions (§F.1.4.4.1.2) — it transitions to itself.
_QE = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 101, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 105, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 110, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 112, 112, 0), (0x59EB, 112, 112, 1),
    (0x5A1D, 113, 113, 0),  # fixed 0.5 bin (index 113)
)

FIXED_BIN = 113

# statistics-area sizes per conditioning table (§F.1.4.4)
DC_STAT_BINS = 64   # 49 used: 5·4 decision tree + X1..X15 + M2..M15
AC_STAT_BINS = 256  # 245 used: 63·3 + two X2.. chains of 28


class Stats:
    """One statistics area: per-bin estimator index + MPS sense."""

    __slots__ = ("idx", "mps")

    def __init__(self, n: int):
        self.idx = bytearray(n)
        self.mps = bytearray(n)


class ArithDecoder:
    """T.81 Annex D decoder over a de-stuffed entropy segment; bytes
    past the segment end read as zero (flush padding)."""

    __slots__ = ("data", "bp", "c", "a", "ct")

    def __init__(self, data: bytes):
        self.data = data
        self.bp = 0
        b0 = self._next()
        b1 = self._next()
        # Mirror of the encoder's alignment: the code value's top 16
        # bits sit at C bits 31..16 (compared against Qe at <<16),
        # A starts at 0x10000 (1.0) exactly like INITENC, and the
        # first renormalization fetches the third byte (CT = 0).
        self.c = (b0 << 24) | (b1 << 16)
        self.ct = 0
        self.a = 0x10000

    def _next(self) -> int:
        if self.bp < len(self.data):
            b = self.data[self.bp]
            self.bp += 1
            return b
        return 0  # zero-feed past end

    def _renorm(self) -> None:
        a, c, ct = self.a, self.c, self.ct
        while True:
            if ct == 0:
                c += self._next() << 8
                ct = 8
            a <<= 1
            c = (c << 1) & 0xFFFFFFFF
            ct -= 1
            if a & 0x8000:
                break
        self.a, self.c, self.ct = a, c, ct

    def decode(self, st: Stats, i: int) -> int:
        idx = st.idx[i]
        mps = st.mps[i]
        qe, nmps, nlps, sw = _QE[idx]
        self.a -= qe
        if (self.c >> 16) < qe:
            # bottom (LPS-sized) subinterval
            if self.a < qe:  # conditional exchange → MPS
                d = mps
                st.idx[i] = nmps
            else:
                d = mps ^ 1
                if sw:
                    st.mps[i] = mps ^ 1
                st.idx[i] = nlps
            self.a = qe
            self._renorm()
        else:
            self.c -= qe << 16
            if self.a & 0x8000 == 0:
                if self.a < qe:  # conditional exchange → LPS
                    d = mps ^ 1
                    if sw:
                        st.mps[i] = mps ^ 1
                    st.idx[i] = nlps
                else:
                    d = mps
                    st.idx[i] = nmps
                self._renorm()
            else:
                d = mps
        return d

    def decode_fixed(self) -> int:
        """The non-adaptive 0.5 bin (AC sign): Qe frozen at 0x5A1D,
        MPS = 0, no estimation update."""
        qe = 0x5A1D
        self.a -= qe
        if (self.c >> 16) < qe:
            d = 0 if self.a < qe else 1
            self.a = qe
            self._renorm()
        else:
            self.c -= qe << 16
            if self.a & 0x8000 == 0:
                d = 1 if self.a < qe else 0
                self._renorm()
            else:
                d = 0
        return d


class ArithEncoder:
    """T.81 Annex D encoder; output is PLAIN bytes (the JPEG layer
    stuffs 0xFF on the wire). Carry propagates through the buffer."""

    __slots__ = ("a", "c", "ct", "out")

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.out = bytearray()

    def _byteout(self) -> None:
        t = self.c >> 19
        if t > 0xFF:
            j = len(self.out) - 1
            while j >= 0 and self.out[j] == 0xFF:
                self.out[j] = 0x00
                j -= 1
            if j < 0:
                # Unreachable for a conforming QM encoder (the first
                # emitted byte can never be 0xFF after stuffing); a
                # silent drop here would corrupt the stream with no
                # signal (ADVICE r12).
                raise AssertionError(
                    "QM encoder: carry propagated past start of stream"
                )
            self.out[j] += 1
            t &= 0xFF
        self.out.append(t)
        self.c &= 0x7FFFF
        self.ct = 8

    def _renorm(self) -> None:
        while True:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def encode(self, st: Stats, i: int, d: int) -> None:
        idx = st.idx[i]
        mps = st.mps[i]
        qe, nmps, nlps, sw = _QE[idx]
        if d == mps:
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe  # MPS: upper subinterval, no renorm
            else:
                if self.a < qe:  # conditional exchange → take bottom
                    self.a = qe
                else:
                    self.c += qe
                st.idx[i] = nmps
                self._renorm()
        else:
            self.a -= qe
            if self.a < qe:  # conditional exchange → LPS takes top
                self.c += qe
            else:
                self.a = qe
            if sw:
                st.mps[i] = mps ^ 1
            st.idx[i] = nlps
            self._renorm()

    def encode_fixed(self, d: int) -> None:
        qe = 0x5A1D
        if d == 0:
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
            else:
                if self.a < qe:
                    self.a = qe
                else:
                    self.c += qe
                self._renorm()
        else:
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            self._renorm()

    def flush(self) -> bytes:
        # CLEARBITS: pick the in-interval code value with the most
        # trailing zeros, then push the remaining bits out
        t = (self.c + self.a - 1) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        return bytes(self.out)


# ---------------------------------------------------------------------------
# DCT statistics model (§F.1.4.4, sequential DCT) — block-level
# decode/encode of one 8×8 coefficient vector in zigzag order.
# `comp` carries per-component scan state: dc_ctx (conditioning
# category of the previous diff) and pred (previous DC value).
# ---------------------------------------------------------------------------


def decode_dc(dec: ArithDecoder, st: Stats, comp: dict,
              lo: int, up: int) -> int:
    """§F.2.4.1: one DC difference; returns the new DC value."""
    s0 = comp["dc_ctx"]
    if dec.decode(st, s0) == 0:
        comp["dc_ctx"] = 0
        return comp["pred"]
    sign = dec.decode(st, s0 + 1)
    st_i = s0 + 2 + sign
    m = dec.decode(st, st_i)
    if m:
        st_i = 20  # X1
        while dec.decode(st, st_i):
            m <<= 1
            if m == 0x8000:
                raise ValueError("JPEG arithmetic DC magnitude overflow")
            st_i += 1
    # next block's conditioning category (F.1.4.4.1.1)
    if m < ((1 << lo) >> 1):
        comp["dc_ctx"] = 0
    elif m > ((1 << up) >> 1):
        comp["dc_ctx"] = 12 + 4 * sign
    else:
        comp["dc_ctx"] = 4 + 4 * sign
    v = m
    st_i += 14  # magnitude bits follow the X bins
    mm = m
    while mm > 1:
        mm >>= 1
        if dec.decode(st, st_i):
            v |= mm
    v += 1
    if sign:
        v = -v
    comp["pred"] += v
    return comp["pred"]


def encode_dc(enc: ArithEncoder, st: Stats, comp: dict,
              dc: int, lo: int, up: int) -> None:
    s0 = comp["dc_ctx"]
    v = dc - comp["pred"]
    comp["pred"] = dc
    if v == 0:
        enc.encode(st, s0, 0)
        comp["dc_ctx"] = 0
        return
    enc.encode(st, s0, 1)
    if v > 0:
        enc.encode(st, s0 + 1, 0)
        sign = 0
    else:
        v = -v
        enc.encode(st, s0 + 1, 1)
        sign = 1
    st_i = s0 + 2 + sign
    m = 0
    v -= 1
    if v:
        enc.encode(st, st_i, 1)
        m = 1
        v2 = v
        st_i = 20  # X1
        while v2 > 1:
            v2 >>= 1
            enc.encode(st, st_i, 1)
            m <<= 1
            st_i += 1
    enc.encode(st, st_i, 0)
    if m < ((1 << lo) >> 1):
        comp["dc_ctx"] = 0
    elif m > ((1 << up) >> 1):
        comp["dc_ctx"] = 12 + 4 * sign
    else:
        comp["dc_ctx"] = 4 + 4 * sign
    st_i += 14
    while m > 1:
        m >>= 1
        enc.encode(st, st_i, 1 if (m & v) else 0)


def decode_ac(dec: ArithDecoder, st: Stats, kx: int,
              zz: list[int]) -> None:
    """§F.2.4.2: AC coefficients 1..63 into zz (zigzag order)."""
    k = 1
    while k <= 63:
        base = 3 * (k - 1)
        if dec.decode(st, base):  # EOB
            return
        while dec.decode(st, base + 1) == 0:
            k += 1
            if k > 63:
                raise ValueError("JPEG arithmetic AC index overflow")
            base = 3 * (k - 1)
        sign = dec.decode_fixed()
        st_i = base + 2
        m = dec.decode(st, st_i)
        if m:
            if dec.decode(st, st_i):  # X2 shares the SP bin's slot
                m = 2
                st_i = 189 if k <= kx else 217
                while dec.decode(st, st_i):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError(
                            "JPEG arithmetic AC magnitude overflow"
                        )
                    st_i += 1
        v = m
        st_i += 14
        mm = m
        while mm > 1:
            mm >>= 1
            if dec.decode(st, st_i):
                v |= mm
        v += 1
        if sign:
            v = -v
        zz[k] = v
        k += 1


def encode_ac(enc: ArithEncoder, st: Stats, kx: int,
              zz: list[int]) -> None:
    ke = 63
    while ke > 0 and zz[ke] == 0:
        ke -= 1
    k = 1
    while k <= ke:
        base = 3 * (k - 1)
        enc.encode(st, base, 0)  # not EOB yet
        while zz[k] == 0:
            enc.encode(st, base + 1, 0)
            k += 1
            base = 3 * (k - 1)
        enc.encode(st, base + 1, 1)
        v = zz[k]
        if v > 0:
            enc.encode_fixed(0)
        else:
            v = -v
            enc.encode_fixed(1)
        st_i = base + 2
        m = 0
        v -= 1
        if v:
            enc.encode(st, st_i, 1)
            m = 1
            v2 = v
            if v2 > 1:
                v2 >>= 1
                enc.encode(st, st_i, 1)
                m = 2
                st_i = 189 if k <= kx else 217
                while v2 > 1:
                    v2 >>= 1
                    enc.encode(st, st_i, 1)
                    m <<= 1
                    st_i += 1
        enc.encode(st, st_i, 0)
        st_i += 14
        while m > 1:
            m >>= 1
            enc.encode(st, st_i, 1 if (m & v) else 0)
        k += 1
    if k <= 63:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


# ---------------------------------------------------------------------------
# Progressive statistics models (T.81 Annex G with arithmetic coding,
# §G.1.2 point transforms + the F.2.4 context layout — the structure
# libjpeg's progressive jcarith/jdarith implement). DC-first scans
# reuse decode_dc/encode_dc on the Al-scaled values; DC refinement is
# one fixed-bin bit per block. AC scans are band-limited (Ss..Se):
# the first pass is the sequential model with coefficients scaled by
# Al, the refinement pass codes correction bits for known-nonzero
# coefficients and newly-significant ±2^Al insertions, with the EOB
# decision gated past the previous stage's last nonzero index.
# ---------------------------------------------------------------------------


def decode_ac_first(dec: ArithDecoder, st: Stats, kx: int,
                    zz: list[int], ss: int, se: int, al: int) -> None:
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if dec.decode(st, base):  # EOB
            return
        while dec.decode(st, base + 1) == 0:
            k += 1
            if k > se:
                raise ValueError("JPEG arithmetic AC index overflow")
            base = 3 * (k - 1)
        sign = dec.decode_fixed()
        st_i = base + 2
        m = dec.decode(st, st_i)
        if m:
            if dec.decode(st, st_i):
                m = 2
                st_i = 189 if k <= kx else 217
                while dec.decode(st, st_i):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError(
                            "JPEG arithmetic AC magnitude overflow"
                        )
                    st_i += 1
        v = m
        st_i += 14
        mm = m
        while mm > 1:
            mm >>= 1
            if dec.decode(st, st_i):
                v |= mm
        v += 1
        zz[k] = -(v << al) if sign else (v << al)
        k += 1


def encode_ac_first(enc: ArithEncoder, st: Stats, kx: int,
                    zz, ss: int, se: int, al: int) -> None:
    ke = se
    while ke >= ss and (abs(int(zz[ke])) >> al) == 0:
        ke -= 1
    k = ss
    while k <= ke:
        base = 3 * (k - 1)
        enc.encode(st, base, 0)  # not EOB yet
        while (abs(int(zz[k])) >> al) == 0:
            enc.encode(st, base + 1, 0)
            k += 1
            base = 3 * (k - 1)
        enc.encode(st, base + 1, 1)
        c = int(zz[k])
        v = abs(c) >> al
        enc.encode_fixed(1 if c < 0 else 0)
        st_i = base + 2
        m = 0
        v -= 1
        if v:
            enc.encode(st, st_i, 1)
            m = 1
            v2 = v
            if v2 > 1:
                v2 >>= 1
                enc.encode(st, st_i, 1)
                m = 2
                st_i = 189 if k <= kx else 217
                while v2 > 1:
                    v2 >>= 1
                    enc.encode(st, st_i, 1)
                    m <<= 1
                    st_i += 1
        enc.encode(st, st_i, 0)
        st_i += 14
        while m > 1:
            m >>= 1
            enc.encode(st, st_i, 1 if (m & v) else 0)
        k += 1
    if k <= se:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


def decode_ac_refine(dec: ArithDecoder, st: Stats,
                     zz: list[int], ss: int, se: int, al: int) -> None:
    p1 = 1 << al
    m1 = -(1 << al)
    kex = se
    while kex > 0 and zz[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if k > kex:
            if dec.decode(st, base):  # EOB
                return
        while True:
            c = zz[k]
            if c:
                if dec.decode(st, base + 2):  # correction bit = 1
                    zz[k] = c + (m1 if c < 0 else p1)
                break
            if dec.decode(st, base + 1):  # newly significant
                zz[k] = m1 if dec.decode_fixed() else p1
                break
            k += 1
            if k > se:
                raise ValueError("JPEG arithmetic AC refine overflow")
            base = 3 * (k - 1)
        k += 1


def encode_ac_refine(enc: ArithEncoder, st: Stats,
                     zz, ss: int, se: int, al: int) -> None:
    # ke: last index significant at THIS stage; kex: last index
    # already significant after the PREVIOUS stage (abs >> Al > 1)
    ke = se
    while ke >= ss and (abs(int(zz[ke])) >> al) == 0:
        ke -= 1
    kex = ke
    while kex >= ss and (abs(int(zz[kex])) >> al) <= 1:
        kex -= 1
    k = ss
    while k <= ke:
        base = 3 * (k - 1)
        if k > kex:
            enc.encode(st, base, 0)  # not EOB yet
        while True:
            v = abs(int(zz[k])) >> al
            if v > 1:  # previously nonzero: correction bit
                enc.encode(st, base + 2, v & 1)
                break
            if v == 1:  # newly significant at this stage
                enc.encode(st, base + 1, 1)
                enc.encode_fixed(1 if int(zz[k]) < 0 else 0)
                break
            enc.encode(st, base + 1, 0)
            k += 1
            base = 3 * (k - 1)
        k += 1
    if k <= se:
        enc.encode(st, 3 * (k - 1), 1)  # EOB
