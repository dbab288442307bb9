#!/usr/bin/env python3
"""Independent-decoder fixture generator for the three multimodal oracle
queries (round-14 verdict task 3). Dev tool, not engine code.

Recipe (reproducible end to end):
  1. for sf in 0.001 0.01 0.1:
       sbt "runMain graft.DumpMedia /root/testdata/sf$sf /tmp/mmdump/sf$sf"
  2. python3 scripts/make_multimodal_fixture.py /tmp/mmdump /root/repo/fixtures

What is independent here: every synthetic media payload's pixels/samples
are a CLOSED FORM of xxhash64(text) (Multimodal.scala's splitmix64 /
palette / sine arithmetic), and PNG/GIF/WAV are lossless for these inputs,
so this script re-derives the expected per-doc decoded features with its
own xxhash64 + splitmix64 + feature folds — pure Python, no JVM, no
production pixel bytes. The ONLY values taken from the production dump
are (a) encoded payload LENGTHS (zlib/LZW block layout is
encoder-internal; compared as given) and (b) the 8x8 bilinear luma
embeddings (Java2D's resampler is not bit-specified; the embedding
fixture pins a snapshot and the oracle independently re-ranks the entire
ANN stage from it in DuckDB).

Float discipline: all feature folds run sequentially in the same order as
the Scala kernels (plain Python floats ARE IEEE doubles; numpy pairwise
summation would NOT match), then canonize floor(x*1e6+0.5)/1e6 like the
engine's r6. Java Math.round = floor(x+0.5) (Python round() is banker's
— do not use it). Java's % truncates while Python's % floors, but Spark's
pmod == Python % for positive modulus.

Fixtures are tagged by corpus_key = sum(len(text)) — corpora are ASCII so
DuckDB's length() agrees — because sf0.001 and sf0.01 share a row count.
"""
import glob
import math
import os
import sys

import pandas as pd

M = (1 << 64) - 1
P1, P2, P3, P4, P5 = (0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F,
                      0x165667B19E3779F9, 0x85EBCA77C2B2AE63,
                      0x27D4EB2F165667C5)


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M


def xxhash64(data: bytes, seed: int = 42) -> int:
    """Reference XXH64 (== Spark's xxhash64 on UTF-8 bytes, seed 42 —
    parity pinned against Spark on 9 vectors incl. every tail length
    class before this script was first used)."""
    n, i = len(data), 0
    if n >= 32:
        v1, v2, v3, v4 = ((seed + P1 + P2) & M, (seed + P2) & M,
                          seed & M, (seed - P1) & M)

        def rnd(v, k):
            return _rotl((v + (k * P2 & M)) & M, 31) * P1 & M

        while i + 32 <= n:
            v1 = rnd(v1, int.from_bytes(data[i:i + 8], 'little'))
            v2 = rnd(v2, int.from_bytes(data[i + 8:i + 16], 'little'))
            v3 = rnd(v3, int.from_bytes(data[i + 16:i + 24], 'little'))
            v4 = rnd(v4, int.from_bytes(data[i + 24:i + 32], 'little'))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h ^= _rotl((v * P2) & M, 31) * P1 & M
            h = (h * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 8 <= n:
        k = int.from_bytes(data[i:i + 8], 'little')
        h ^= _rotl((k * P2) & M, 31) * P1 & M
        h = (_rotl(h, 27) * P1 + P4) & M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], 'little') * P1) & M
        h = (_rotl(h, 23) * P2 + P3) & M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M
        h = (_rotl(h, 11) * P1) & M
        i += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def mix64(z0: int) -> int:
    """Multimodal.mix64 splitmix64, unsigned-64 domain."""
    z = (z0 + 0x9E3779B97F4A7C15) & M
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
    return z ^ (z >> 31)


def r6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


# GIF palette: Multimodal.gifPalette closed form (Java int division).
_PAL = [((((i >> 5) & 7) * 255) // 7, (((i >> 2) & 7) * 255) // 7,
         ((i & 3) * 255) // 3) for i in range(256)]


def media_params(text: str):
    """syntheticMedia's per-doc derivation: h = xxhash64(utf8(text)) and
    every dimension a pmod of it (Spark pmod == Python %)."""
    h = xxhash64(text.encode('utf-8'))
    return {
        'h': h, 'hu': h & M,
        'fmt': h % 3,
        'w': h % 120 + 8, 'ht': h % 90 + 8,
        'n_samp': h % 1536 + 512,
        'vw': h % 24 + 8, 'vh': h % 18 + 8, 'vf': h % 6 + 2,
    }


def raster_sums(pix_iter):
    """MediaKernels.rasterSums over an iterable of (r, g, b) 0..255 ints,
    in the kernel's row-major order."""
    sr = sg = sb = sl = sl2 = 0.0
    min_l, max_l = sys.float_info.max, -sys.float_info.max
    bright = 0
    n = 0
    for rr, gg, bb in pix_iter:
        r = rr / 255.0
        g = gg / 255.0
        b = bb / 255.0
        l = 0.299 * r + 0.587 * g + 0.114 * b
        sr += r
        sg += g
        sb += b
        sl += l
        sl2 += l * l
        if l < min_l:
            min_l = l
        if l > max_l:
            max_l = l
        if l > 0.5:
            bright += 1
        n += 1
    return sr, sg, sb, sl, sl2, min_l, max_l, bright, n


def png_pixels(hu, w, ht):
    for y in range(ht):
        for x in range(w):
            m = mix64(hu ^ (x << 32) ^ y)
            rgb = m & 0xFFFFFF
            yield (rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF


def gif_frame_pixels(hu, fidx, vw, vh):
    for y in range(vh):
        for x in range(vw):
            m = mix64(hu ^ (fidx << 48) ^ (x << 24) ^ y)
            yield _PAL[m & 0xFF]


def image_features(hu, w, ht):
    sr, sg, sb, sl, sl2, min_l, max_l, bright, n_pix = raster_sums(
        png_pixels(hu, w, ht))
    n = float(n_pix)
    mean_l = sl / n
    var_l = max(sl2 / n - mean_l * mean_l, 0.0)
    return [sr / n, sg / n, sb / n, mean_l, math.sqrt(var_l),
            min_l, max_l, bright / n]


def video_features(hu, vw, vh, vf):
    sr = sg = sb = sl = 0.0
    n_pix = 0
    frame_means = []
    for fidx in range(vf):
        fsr, fsg, fsb, fsl, _, _, _, _, fn = raster_sums(
            gif_frame_pixels(hu, fidx, vw, vh))
        sr += fsr
        sg += fsg
        sb += fsb
        sl += fsl
        n_pix += fn
        frame_means.append(fsl / fn)
    nf = vf
    fm_mean = sum(frame_means) / nf           # Scala Array[Double].sum: left fold
    fm_var = max(sum((m - fm_mean) * (m - fm_mean) for m in frame_means) / nf, 0.0)
    d_abs = 0.0
    for i in range(1, nf):
        d_abs += abs(frame_means[i] - frame_means[i - 1])
    n = float(n_pix)
    return [sr / n, sg / n, sb / n, sl / n, math.sqrt(fm_var),
            min(frame_means), max(frame_means),
            d_abs / (nf - 1) if nf > 1 else 0.0]


def audio_features(hu, n_samp):
    rate = 8000
    freq = 100 + mix64(hu) % 900                       # remainderUnsigned
    amp = 0.30 + (mix64((hu + 1) & M) % 40) / 100.0
    s0 = s2 = sa = 0.0
    mn, mx = sys.float_info.max, -sys.float_info.max
    loud = zc = 0
    prev = 0.0
    for i in range(n_samp):
        v_gen = amp * math.sin(2.0 * math.pi * freq * i / rate)
        s = math.floor(v_gen * 32767.0 + 0.5)          # Java Math.round
        v = (s / 32768.0) / 1                          # decode: acc/ch, ch=1
        s0 += v
        s2 += v * v
        sa += abs(v)
        if v < mn:
            mn = v
        if v > mx:
            mx = v
        if abs(v) > 0.5:
            loud += 1
        if i > 0 and prev * v < 0:
            zc += 1
        prev = v
    nd = float(max(n_samp, 1))
    return [s0 / nd, math.sqrt(s2 / nd),
            mn if n_samp else 0.0, mx if n_samp else 0.0,
            zc / (n_samp - 1) if n_samp > 1 else 0.0,
            sa / nd, loud / nd, n_samp / float(rate)]


def read_one(parquet_dir):
    files = glob.glob(f"{parquet_dir}/*.parquet")
    assert files, f"no parquet under {parquet_dir}"
    return pd.concat([pd.read_parquet(f) for f in sorted(files)],
                     ignore_index=True)


def main():
    dump_root = sys.argv[1] if len(sys.argv) > 1 else '/tmp/mmdump'
    out_dir = sys.argv[2] if len(sys.argv) > 2 else '/root/repo/fixtures'
    os.makedirs(out_dir, exist_ok=True)
    feat_rows, trans_rows, emb_frames = [], [], []
    for sf in ('0.001', '0.01', '0.1'):
        docs = pd.read_parquet(
            f"/root/testdata/sf{sf}/documents.parquet",
            columns=['doc_id', 'text']).sort_values('doc_id')
        corpus_key = int(docs['text'].str.len().sum())
        lens_raw = read_one(f"{dump_root}/sf{sf}/lens_raw") \
            .set_index('media_id')['payload_bytes'].to_dict()
        lens_tr = read_one(f"{dump_root}/sf{sf}/lens_transformed") \
            .set_index('media_id')['payload_bytes'].to_dict()
        for doc_id, text in zip(docs['doc_id'], docs['text']):
            p = media_params(text)
            if doc_id < 120:
                if p['fmt'] == 0:
                    fmt, w, ht, nf = 'img', p['w'], p['ht'], 1
                    f = image_features(p['hu'], p['w'], p['ht'])
                elif p['fmt'] == 1:
                    fmt, w, ht, nf = 'audio', p['w'], p['ht'], p['n_samp']
                    f = audio_features(p['hu'], p['n_samp'])
                else:
                    fmt, w, ht, nf = 'video', p['vw'], p['vh'], p['vf']
                    f = video_features(p['hu'], p['vw'], p['vh'], p['vf'])
                feat_rows.append(dict(
                    corpus_key=corpus_key, doc_id=int(doc_id), format=fmt,
                    width=w, height=ht, n_frames=nf,
                    payload_bytes=int(lens_raw[doc_id]),
                    **{f"f{i}": r6(f[i]) for i in range(8)}))
            # transform fixture: integer metadata, full corpus
            if p['fmt'] == 0:
                # resized by contract; decode returns 16x12, meta n_frames=1
                t = ('img', 16, 12, 1)
            elif p['fmt'] == 1:
                t = ('audio', p['w'], p['ht'], p['n_samp'])
            else:
                kept = (p['vf'] + 1) // 2              # ceil(vf / 2)
                t = ('video', p['vw'], p['vh'], kept)
            trans_rows.append(dict(
                corpus_key=corpus_key, media_id=int(doc_id), format=t[0],
                payload_bytes=int(lens_tr[doc_id]),
                width=t[1], height=t[2], n_frames=t[3]))
        emb = read_one(f"{dump_root}/sf{sf}/embeddings")
        emb.insert(0, 'corpus_key', corpus_key)
        emb_frames.append(emb)

    pd.DataFrame(feat_rows).to_parquet(
        f"{out_dir}/multimodal_features.parquet", index=False)
    pd.DataFrame(trans_rows).to_parquet(
        f"{out_dir}/multimodal_transform.parquet", index=False)
    pd.concat(emb_frames, ignore_index=True).to_parquet(
        f"{out_dir}/multimodal_embeddings.parquet", index=False)
    print(f"features rows: {len(feat_rows)}  transform rows: {len(trans_rows)}"
          f"  embedding rows: {sum(len(e) for e in emb_frames)}")


if __name__ == '__main__':
    main()
