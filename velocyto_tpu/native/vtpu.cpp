// libvtpu: native host-side runtime for velocyto_tpu.
//
// Components:
//   1. vtpu_balance_knn     - greedy balanced-kNN loop (the reference uses a
//                             numba jit for this, velocyto/neighbors.py:11-140;
//                             it is inherently sequential so it lives on the
//                             host, in C++)
//   2. vtpu_bam_*           - BGZF/BAM streaming decoder (the reference uses
//                             pysam/htslib, velocyto/counter.py:217-306).
//                             Decodes batches of alignment records into
//                             structure-of-arrays buffers ready for the
//                             vectorized counting pipeline, including the
//                             CIGAR->segments parse with small-indel patching
//                             (reference counter.py:85-129 semantics).
//
// Build: make -C velocyto_tpu/native   (produces libvtpu.so, loaded via ctypes)

#include <algorithm>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>
#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// balanced kNN
// ---------------------------------------------------------------------------

void vtpu_balance_knn(const int64_t* dsi, const double* dist,
                      const int64_t* lsi, const int64_t* constraint,
                      int64_t n, int64_t sight, int64_t maxl, int64_t k,
                      int return_distance,
                      int64_t* dsi_new, double* dist_new, int64_t* l) {
    // dsi_new must be pre-filled with -1, dist_new with 0, l with 0.
    for (int64_t i = 0; i < n; ++i) {
        const int64_t el = lsi[i];
        const int64_t* row = dsi + el * sight;
        int64_t p = 0;
        int64_t j = 0;
        for (j = 0; j < sight; ++j) {
            if (p >= k) break;
            const int64_t m = row[j];
            if (el == m) { dsi_new[el * (k + 1)] = el; continue; }
            if (constraint && constraint[el] != constraint[m]) continue;
            if (l[m] >= maxl) continue;
            dsi_new[el * (k + 1) + p + 1] = m;
            l[m] += 1;
            if (return_distance)
                dist_new[el * (k + 1) + p + 1] = dist[el * sight + j];
            ++p;
        }
        if (j == sight && p < k) j = sight - 1;  // loop ran to completion
        if (j == sight - 1 && p < k) {
            while (p < k) {
                dsi_new[el * (k + 1) + p + 1] = el;
                dist_new[el * (k + 1) + p + 1] = dist[el * sight];
                ++p;
            }
        }
    }
}

// ---------------------------------------------------------------------------
// BGZF + BAM decoder
// ---------------------------------------------------------------------------

// BGZF blocks are independently deflate-compressed, so decompression is
// pipelined: worker threads read blocks from the file (sequentially,
// under the handle lock), inflate them in parallel, and the consumer
// reassembles the decoded stream in block order.  On a 2-core host this
// overlaps inflate with the BAM record parse and the python counting
// work above it.
struct BamHandle {
    FILE* fp = nullptr;
    std::vector<uint8_t> buf;       // decoded byte stream (rolling)
    size_t buf_pos = 0;             // consume cursor into buf
    std::vector<std::string> refs;
    std::vector<int64_t> ref_len;
    // inflate pipeline
    std::mutex mu;
    std::condition_variable cv_out;   // consumer: next block ready / eof
    std::condition_variable cv_room;  // workers: reorder window has room
    std::map<uint64_t, std::vector<uint8_t>> ready;  // seq -> decoded bytes
    uint64_t seq_read = 0;          // next block sequence number to assign
    uint64_t seq_out = 0;           // next sequence the consumer needs
    bool file_eof = false;
    bool perr = false;              // pipeline hard error
    bool stop = false;
    std::vector<std::thread> workers;
    // ranged decode (multi-feeder counting): position in the UNCOMPRESSED
    // record stream, and an exclusive stop offset (a record boundary
    // from the .vtx cell index)
    uint64_t u_consumed = 0;
    uint64_t u_limit = UINT64_MAX;
    uint64_t u_header = 0;          // stream offset of the first record
};

static const uint64_t BGZF_WINDOW = 64;   // max in-flight blocks (<= 4 MiB)

// Read one BGZF block's compressed payload (+ trailing crc32/isize).
// Caller holds h->mu.  Returns 1 on success, 0 at EOF, -1 on error.
static int read_block_locked(BamHandle* h, std::vector<uint8_t>& cdata,
                             int& cdata_len) {
    uint8_t hdr[18];
    size_t got = fread(hdr, 1, 18, h->fp);
    if (got == 0) return 0;
    if (got < 18 || hdr[0] != 0x1f || hdr[1] != 0x8b) return -1;
    const uint16_t xlen = hdr[10] | (hdr[11] << 8);
    std::vector<uint8_t> extra(xlen);
    // 6 bytes of the extra field were already consumed into hdr[12..17]
    memcpy(extra.data(), hdr + 12, xlen < 6 ? xlen : 6);
    if (xlen > 6 &&
        fread(extra.data() + 6, 1, xlen - 6, h->fp) != (size_t)(xlen - 6))
        return -1;
    int bsize = -1;
    for (size_t p = 0; p + 4 <= extra.size();) {
        const uint8_t si1 = extra[p], si2 = extra[p + 1];
        const uint16_t slen = extra[p + 2] | (extra[p + 3] << 8);
        if (si1 == 'B' && si2 == 'C' && slen == 2)
            bsize = (extra[p + 4] | (extra[p + 5] << 8)) + 1;
        p += 4 + slen;
    }
    if (bsize < 0) return -1;
    cdata_len = bsize - 18 - xlen + 6 - 8;
    if (cdata_len < 0) return -1;
    cdata.resize(cdata_len + 8);
    if (fread(cdata.data(), 1, cdata.size(), h->fp) != cdata.size())
        return -1;
    return 1;
}

static void inflate_worker(BamHandle* h) {
    for (;;) {
        std::vector<uint8_t> cdata;
        int clen = 0;
        uint64_t myseq;
        {
            std::unique_lock<std::mutex> lk(h->mu);
            h->cv_room.wait(lk, [&] {
                return h->stop || h->perr || h->file_eof ||
                       h->seq_read - h->seq_out < BGZF_WINDOW;
            });
            if (h->stop || h->perr || h->file_eof) return;
            const int r = read_block_locked(h, cdata, clen);
            if (r <= 0) {
                if (r < 0) h->perr = true;
                h->file_eof = true;
                h->cv_out.notify_all();
                h->cv_room.notify_all();
                return;
            }
            myseq = h->seq_read++;
        }
        uint32_t isize;
        memcpy(&isize, cdata.data() + clen + 4, 4);
        std::vector<uint8_t> out;
        bool bad = false;
        if (isize > (1u << 16)) {        // BGZF blocks are <= 64 KiB
            bad = true;
        } else if (isize > 0) {          // isize == 0: EOF marker block
            out.resize(isize);
            z_stream zs;
            memset(&zs, 0, sizeof zs);
            if (inflateInit2(&zs, -15) != Z_OK) {
                bad = true;
            } else {
                zs.next_in = cdata.data();
                zs.avail_in = clen;
                zs.next_out = out.data();
                zs.avail_out = isize;
                const int r = inflate(&zs, Z_FINISH);
                inflateEnd(&zs);
                if (r != Z_STREAM_END) bad = true;
            }
        }
        std::lock_guard<std::mutex> lk(h->mu);
        if (bad) {
            h->perr = true;
            h->cv_out.notify_all();
            h->cv_room.notify_all();
            return;
        }
        h->ready.emplace(myseq, std::move(out));
        h->cv_out.notify_all();
    }
}

static void start_pipeline(BamHandle* h) {
    int n = 0;
    if (const char* env = getenv("VTPU_INFLATE_THREADS")) n = atoi(env);
    if (n <= 0) {
        const unsigned hw = std::thread::hardware_concurrency();
        n = (int)std::min(4u, hw ? hw : 2u);
    }
    for (int i = 0; i < n; ++i)
        h->workers.emplace_back(inflate_worker, h);
}

static void stop_pipeline(BamHandle* h) {
    {
        std::lock_guard<std::mutex> lk(h->mu);
        h->stop = true;
        h->cv_room.notify_all();
        h->cv_out.notify_all();
    }
    for (auto& t : h->workers) t.join();
    h->workers.clear();
}

// Append decoded blocks to `buf` until it holds >= want bytes past buf_pos
// or the stream is exhausted.  Returns false on hard error.
static bool fill(BamHandle* h, size_t want) {
    // compact
    if (h->buf_pos > (1u << 20)) {
        h->buf.erase(h->buf.begin(), h->buf.begin() + h->buf_pos);
        h->buf_pos = 0;
    }
    while (h->buf.size() - h->buf_pos < want) {
        std::vector<uint8_t> chunk;
        {
            std::unique_lock<std::mutex> lk(h->mu);
            h->cv_out.wait(lk, [&] {
                return h->perr || h->ready.count(h->seq_out) ||
                       (h->file_eof && h->seq_out >= h->seq_read);
            });
            if (h->perr) return false;
            auto it = h->ready.find(h->seq_out);
            if (it == h->ready.end()) break;   // EOF, fully drained
            chunk = std::move(it->second);
            h->ready.erase(it);
            ++h->seq_out;
            h->cv_room.notify_all();
        }
        h->buf.insert(h->buf.end(), chunk.begin(), chunk.end());
    }
    return true;
}

static bool take(BamHandle* h, void* dst, size_t n) {
    if (!fill(h, n)) return false;
    if (h->buf.size() - h->buf_pos < n) return false;
    memcpy(dst, h->buf.data() + h->buf_pos, n);
    h->buf_pos += n;
    h->u_consumed += n;
    return true;
}

void* vtpu_bam_open(const char* path) {
    BamHandle* h = new BamHandle();
    h->fp = fopen(path, "rb");
    if (!h->fp) { delete h; return nullptr; }
    start_pipeline(h);
    char magic[4];
    if (!take(h, magic, 4) || memcmp(magic, "BAM\x01", 4) != 0) {
        stop_pipeline(h); fclose(h->fp); delete h; return nullptr;
    }
    int32_t l_text;
    if (!take(h, &l_text, 4)) { stop_pipeline(h); fclose(h->fp); delete h; return nullptr; }
    std::vector<char> text(l_text);
    if (l_text && !take(h, text.data(), l_text)) {
        stop_pipeline(h); fclose(h->fp); delete h; return nullptr;
    }
    int32_t n_ref;
    if (!take(h, &n_ref, 4)) { stop_pipeline(h); fclose(h->fp); delete h; return nullptr; }
    for (int32_t i = 0; i < n_ref; ++i) {
        int32_t l_name, l_ref;
        if (!take(h, &l_name, 4)) { stop_pipeline(h); fclose(h->fp); delete h; return nullptr; }
        std::vector<char> nm(l_name);
        if (!take(h, nm.data(), l_name)) {
            stop_pipeline(h); fclose(h->fp); delete h; return nullptr;
        }
        if (!take(h, &l_ref, 4)) { stop_pipeline(h); fclose(h->fp); delete h; return nullptr; }
        h->refs.emplace_back(nm.data());
        h->ref_len.push_back(l_ref);
    }
    h->u_header = h->u_consumed;
    return h;
}

void vtpu_bam_close(void* vh) {
    BamHandle* h = (BamHandle*)vh;
    stop_pipeline(h);
    if (h->fp) fclose(h->fp);
    delete h;
}

// Reposition the decode stream to an UNCOMPRESSED offset (from the .vtx
// cell index -- always a record boundary).  Walks BGZF block headers
// (no inflate) to the covering block, restarts the inflate pipeline
// there, and drops the in-block prefix.  Returns 0 on success.
int vtpu_bam_seek_uncompressed(void* vh, uint64_t ustart) {
    BamHandle* h = (BamHandle*)vh;
    if (ustart < h->u_header) ustart = h->u_header;   // skip the header
    stop_pipeline(h);
    {
        std::lock_guard<std::mutex> lk(h->mu);
        h->ready.clear();
        h->seq_read = h->seq_out = 0;
        h->file_eof = h->perr = h->stop = false;
        h->buf.clear();
        h->buf_pos = 0;
    }
    if (fseek(h->fp, 0, SEEK_SET) != 0) return -1;
    uint64_t u_total = 0;
    long coff = 0;
    for (;;) {
        uint8_t hdr[18];
        if (fread(hdr, 1, 18, h->fp) != 18) break;            // EOF
        if (hdr[0] != 0x1f || hdr[1] != 0x8b) return -1;
        const uint16_t xlen = hdr[10] | (hdr[11] << 8);
        std::vector<uint8_t> extra(xlen);
        memcpy(extra.data(), hdr + 12, xlen < 6 ? xlen : 6);
        if (xlen > 6 && fread(extra.data() + 6, 1, xlen - 6, h->fp)
                != (size_t)(xlen - 6))
            return -1;
        int bsize = -1;
        for (size_t p = 0; p + 4 <= extra.size();) {
            const uint8_t si1 = extra[p], si2 = extra[p + 1];
            const uint16_t slen = extra[p + 2] | (extra[p + 3] << 8);
            if (si1 == 'B' && si2 == 'C' && slen == 2)
                bsize = (extra[p + 4] | (extra[p + 5] << 8)) + 1;
            p += 4 + slen;
        }
        if (bsize < 0) return -1;
        uint32_t isize;
        if (fseek(h->fp, coff + bsize - 4, SEEK_SET) != 0) return -1;
        if (fread(&isize, 4, 1, h->fp) != 1) return -1;
        if (u_total + isize > ustart) {
            if (fseek(h->fp, coff, SEEK_SET) != 0) return -1;
            break;
        }
        u_total += isize;
        coff += bsize;
        if (fseek(h->fp, coff, SEEK_SET) != 0) return -1;
    }
    h->u_consumed = u_total;
    start_pipeline(h);
    // drop the in-block prefix up to the exact record boundary
    uint64_t drop = ustart - u_total;
    std::vector<uint8_t> scratch(1 << 16);
    while (drop > 0) {
        size_t n = drop < scratch.size() ? (size_t)drop : scratch.size();
        if (!take(h, scratch.data(), n)) return -1;
        drop -= n;
    }
    return 0;
}

void vtpu_bam_set_limit(void* vh, uint64_t uend) {
    ((BamHandle*)vh)->u_limit = uend;
}

// Advance the decode cursor n bytes without copying record payloads out.
static bool skip_bytes(BamHandle* h, size_t n) {
    while (n > 0) {
        size_t avail = h->buf.size() - h->buf_pos;
        if (avail == 0) {
            if (!fill(h, 1)) return false;
            avail = h->buf.size() - h->buf_pos;
            if (avail == 0) return false;       // clean EOF mid-record
        }
        size_t step = n < avail ? n : avail;
        h->buf_pos += step;
        h->u_consumed += step;
        n -= step;
    }
    return true;
}

// Record-boundary split points for ranged parallel scans of a BAM with
// no sidecar index (e.g. the position-sorted markup input): inflate the
// stream and walk record length prefixes ONLY (no field/tag parsing, no
// python), emitting up to max_out uncompressed offsets spaced >= stride
// bytes apart, each the offset of a record start.  Writes the
// end-of-records offset to *u_end and the record count to *n_records.
// Returns the number of offsets emitted, or -1 on error.
int64_t vtpu_bam_record_offsets(const char* path, uint64_t stride,
                                uint64_t* out, int64_t max_out,
                                int64_t* n_records, uint64_t* u_end) {
    BamHandle* h = (BamHandle*)vtpu_bam_open(path);
    if (!h) return -1;
    int64_t n_out = 0, total = 0;
    uint64_t last_emitted = 0;
    bool first = true;
    for (;;) {
        const uint64_t rec_off = h->u_consumed;
        int32_t block_size;
        if (!fill(h, 4)) { vtpu_bam_close(h); return -1; }
        if (h->buf.size() - h->buf_pos < 4) break;      // end of records
        if (!take(h, &block_size, 4)) break;
        if (block_size <= 0) { vtpu_bam_close(h); return -1; }
        if (first || rec_off >= last_emitted + stride) {
            if (n_out < max_out) {
                out[n_out++] = rec_off;
                last_emitted = rec_off;
            }
            first = false;
        }
        if (!skip_bytes(h, (size_t)block_size)) {
            vtpu_bam_close(h); return -1;
        }
        ++total;
    }
    if (u_end) *u_end = h->u_consumed;
    if (n_records) *n_records = total;
    vtpu_bam_close(h);
    return n_out;
}

int64_t vtpu_bam_n_refs(void* vh) { return ((BamHandle*)vh)->refs.size(); }

const char* vtpu_bam_ref_name(void* vh, int64_t i) {
    return ((BamHandle*)vh)->refs[i].c_str();
}

// Find a tag in the aux data; returns pointer to the type byte or nullptr.
static const uint8_t* find_tag(const uint8_t* aux, const uint8_t* end,
                               const char* tag) {
    const uint8_t* p = aux;
    while (p + 3 <= end) {
        const bool hit = (p[0] == (uint8_t)tag[0] && p[1] == (uint8_t)tag[1]);
        const uint8_t typ = p[2];
        const uint8_t* val = p + 3;
        if (hit) return p + 2;
        switch (typ) {
            case 'A': case 'c': case 'C': p = val + 1; break;
            case 's': case 'S': p = val + 2; break;
            case 'i': case 'I': case 'f': p = val + 4; break;
            case 'Z': case 'H': {
                const uint8_t* q = val;
                while (q < end && *q) ++q;
                p = q + 1;
                break;
            }
            case 'B': {
                const uint8_t sub = *val;
                int32_t cnt;
                memcpy(&cnt, val + 1, 4);
                int sz = (sub == 'c' || sub == 'C') ? 1 :
                         (sub == 's' || sub == 'S') ? 2 : 4;
                p = val + 5 + (int64_t)sz * cnt;
                break;
            }
            default: return nullptr;  // malformed
        }
    }
    return nullptr;
}

static int64_t tag_int(const uint8_t* typep, int64_t dflt) {
    if (!typep) return dflt;
    const uint8_t* v = typep + 1;
    switch (*typep) {
        case 'c': return *(const int8_t*)v;
        case 'C': return *(const uint8_t*)v;
        case 's': { int16_t x; memcpy(&x, v, 2); return x; }
        case 'S': { uint16_t x; memcpy(&x, v, 2); return x; }
        case 'i': { int32_t x; memcpy(&x, v, 4); return x; }
        case 'I': { uint32_t x; memcpy(&x, v, 4); return x; }
        default: return dflt;
    }
}

// Decode up to max_reads records into SoA buffers.  Returns the number of
// records decoded (0 at EOF, -1 on error).  flags_ok[i]==0 marks records to
// skip (unmapped / NH!=1 / missing barcode), which still occupy a slot.
int64_t vtpu_bam_read_batch(void* vh, int64_t max_reads, int64_t max_segs,
                            const char* bc_tag, const char* umi_tag,
                            int32_t* chrom_id, uint8_t* strand, int64_t* pos,
                            int32_t* n_segs, int64_t* seg_start,
                            int64_t* seg_end, int32_t* clip5, int32_t* clip3,
                            uint8_t* ref_skip, uint8_t* flags_ok,
                            char* bc_buf, char* umi_buf, int require_unique,
                            const char* aux_tag, char* aux_buf,
                            int32_t seq_prefix, char* seq_buf) {
    BamHandle* h = (BamHandle*)vh;
    int64_t count = 0;
    std::vector<uint8_t> rec;
    while (count < max_reads) {
        if (h->u_consumed >= h->u_limit) break;   // end of owned range
        int32_t block_size;
        if (!fill(h, 4)) return -1;
        if (h->buf.size() - h->buf_pos < 4) break;  // EOF
        if (!take(h, &block_size, 4)) break;
        rec.resize(block_size);
        if (!take(h, rec.data(), block_size)) return -1;
        const uint8_t* r = rec.data();
        int32_t ref_id, p0;
        memcpy(&ref_id, r, 4);
        memcpy(&p0, r + 4, 4);
        const uint8_t l_read_name = r[8];
        const uint16_t n_cigar = r[12] | (r[13] << 8);
        const uint16_t flag = r[14] | (r[15] << 8);
        int32_t l_seq;
        memcpy(&l_seq, r + 16, 4);

        const int64_t i = count++;
        chrom_id[i] = ref_id;
        strand[i] = (flag & 0x10) ? 1 : 0;
        pos[i] = (int64_t)p0 + 1;  // 1-based
        clip5[i] = clip3[i] = 0;
        ref_skip[i] = 0;
        n_segs[i] = 0;
        memset(bc_buf + i * 32, 0, 32);
        memset(umi_buf + i * 32, 0, 32);
        if (aux_buf) memset(aux_buf + i * 32, 0, 32);
        if (seq_buf) memset(seq_buf + i * 32, 0, 32);
        flags_ok[i] = 0;

        if (flag & 0x4) continue;  // unmapped

        const uint8_t* cig = r + 32 + l_read_name;
        const uint8_t* seq = cig + 4 * n_cigar;
        const uint8_t* aux = seq + (l_seq + 1) / 2 + l_seq;
        const uint8_t* end = rec.data() + block_size;

        if (require_unique) {
            const uint8_t* nh = find_tag(aux, end, "NH");
            if (nh && tag_int(nh, 1) != 1) continue;
        }
        // CIGAR -> segments with small-indel patching
        // (reference counter.py:85-129: soft clips ADVANCE the cursor; a
        // deletion/insertion <= PATCH_INDELS flanked by matches merges the
        // adjacent segments)
        int64_t pcur = pos[i];
        int ns = 0;
        bool overflow = false;
        int64_t ss[64], se[64];
        bool merge_next = false;   // pending merge of segment ns-1 with next
        for (int ci = 0; ci < n_cigar; ++ci) {
            uint32_t v;
            memcpy(&v, cig + 4 * ci, 4);
            const uint32_t op = v & 0xF, len = v >> 4;
            switch (op) {
                case 0: case 7: case 8:  // M, =, X consume both
                    if (merge_next && ns > 0) {
                        se[ns - 1] = pcur + len - 1;
                        merge_next = false;
                    } else {
                        if (ns >= 64 || ns >= max_segs) { overflow = true; }
                        else { ss[ns] = pcur; se[ns] = pcur + len - 1; ++ns; }
                    }
                    pcur += len;
                    break;
                case 3:  // N ref-skip
                    ref_skip[i] = 1;
                    pcur += len;
                    merge_next = false;
                    break;
                case 2:  // D
                    if (len <= 3 && ci + 1 < n_cigar && ci > 0) {
                        uint32_t nv, pv;
                        memcpy(&nv, cig + 4 * (ci + 1), 4);
                        memcpy(&pv, cig + 4 * (ci - 1), 4);
                        if ((nv & 0xF) == 0 && (pv & 0xF) == 0 && ns > 0)
                            merge_next = true;
                    }
                    pcur += len;
                    break;
                case 1:  // I
                    if (len <= 3 && ci + 1 < n_cigar && ci > 0) {
                        uint32_t nv, pv;
                        memcpy(&nv, cig + 4 * (ci + 1), 4);
                        memcpy(&pv, cig + 4 * (ci - 1), 4);
                        if ((nv & 0xF) == 0 && (pv & 0xF) == 0 && ns > 0)
                            merge_next = true;
                    }
                    break;
                case 4:  // S soft clip (advances cursor, reference semantics)
                    if (pcur == pos[i]) clip5[i] = len; else clip3[i] = len;
                    pcur += len;
                    break;
                default: break;  // H/P ignored
            }
        }
        if (overflow) continue;  // too many segments; caller may log
        n_segs[i] = ns;
        for (int s = 0; s < ns; ++s) {
            seg_start[i * max_segs + s] = ss[s];
            seg_end[i * max_segs + s] = se[s];
        }
        // barcode + umi tags
        const uint8_t* bct = find_tag(aux, end, bc_tag);
        const uint8_t* umt = find_tag(aux, end, umi_tag);
        if (bct && *bct == 'Z') {
            const char* v = (const char*)(bct + 1);
            size_t L = strnlen(v, 31);
            memcpy(bc_buf + i * 32, v, L);
            bc_buf[i * 32 + L] = 0;
        }
        if (umt && *umt == 'Z') {
            const char* v = (const char*)(umt + 1);
            size_t L = strnlen(v, 31);
            memcpy(umi_buf + i * 32, v, L);
            umi_buf[i * 32 + L] = 0;
        }
        if (seq_buf && seq_prefix > 0) {
            // first seq_prefix bases of the 4-bit packed sequence
            static const char NT[17] = "=ACMGRSVTWYHKDBN";
            int32_t L = l_seq < seq_prefix ? l_seq : seq_prefix;
            if (L > 31) L = 31;
            for (int32_t s = 0; s < L; ++s) {
                uint8_t byte = seq[s / 2];
                seq_buf[i * 32 + s] =
                    NT[(s % 2 == 0) ? (byte >> 4) : (byte & 0xF)];
            }
        }
        if (aux_buf && aux_tag && aux_tag[0]) {
            const uint8_t* axt = find_tag(aux, end, aux_tag);
            if (axt && *axt == 'Z') {
                const char* v = (const char*)(axt + 1);
                size_t L = strnlen(v, 31);
                memcpy(aux_buf + i * 32, v, L);
                aux_buf[i * 32 + L] = 0;
            }
        }
        flags_ok[i] = 1;
    }
    return count;
}

// Exact hash factorize over n fixed-width byte keys (contiguous,
// `width` bytes each).  codes[i] = dense group id in first-appearance
// order; firsts[j] = row index of group j's first occurrence (callers
// gather the unique keys with it).  Returns the number of groups.
// Replaces pandas.factorize on the counting hot path: pandas boxes
// every fixed-width numpy bytes row into a python object first.
int64_t vtpu_factorize_fixed(const uint8_t* keys, int64_t n, int64_t width,
                             int64_t* codes, int64_t* firsts) {
    if (n <= 0) return 0;
    size_t cap = 16;
    while (cap < (size_t)n * 2) cap <<= 1;
    std::vector<int64_t> table(cap, -1);   // slot -> group id
    int64_t k = 0;
    for (int64_t i = 0; i < n; ++i) {
        const uint8_t* key = keys + i * width;
        uint64_t h = 1469598103934665603ULL;
        int64_t b = 0;
        for (; b + 8 <= width; b += 8) {
            uint64_t w;
            memcpy(&w, key + b, 8);
            h = (h ^ w) * 1099511628211ULL;
            h ^= h >> 29;
        }
        for (; b < width; ++b) h = (h ^ key[b]) * 1099511628211ULL;
        size_t slot = h & (cap - 1);
        for (;;) {
            int64_t c = table[slot];
            if (c < 0) {
                table[slot] = k;
                firsts[k] = i;
                codes[i] = k;
                ++k;
                break;
            }
            if (memcmp(keys + firsts[c] * width, key, (size_t)width) == 0) {
                codes[i] = c;
                break;
            }
            slot = (slot + 1) & (cap - 1);
        }
    }
    return k;
}

}  // extern "C"

// -- numpy-parity weighted sampling without replacement ---------------------
//
// Replicates numpy's legacy RandomState.choice(pop, size, replace=False,
// p=...) byte-for-byte: standard MT19937 (init_genrand seeding, numpy's
// 53-bit double recipe) driving the exact rejection loop of
// numpy/random/mtrand.pyx (zero the already-found entries, cumsum+
// normalize, searchsorted side='right', first-occurrence dedup in draw
// order).  estimate_transition_prob's per-row sampling loop is this
// algorithm called n_cells times on one shared p — the python loop is
// ~12 s at 20k cells; this is the same RNG stream in C++.

struct Mt19937 {
    uint32_t mt[624];
    int mti;
    explicit Mt19937(uint32_t s) {
        mt[0] = s;
        for (int i = 1; i < 624; ++i)
            mt[i] = 1812433253u * (mt[i - 1] ^ (mt[i - 1] >> 30)) + (uint32_t)i;
        mti = 624;
    }
    uint32_t next() {
        if (mti >= 624) {
            for (int i = 0; i < 624; ++i) {
                uint32_t y = (mt[i] & 0x80000000u) | (mt[(i + 1) % 624] & 0x7fffffffu);
                uint32_t v = mt[(i + 397) % 624] ^ (y >> 1);
                if (y & 1u) v ^= 2567483615u;
                mt[i] = v;
            }
            mti = 0;
        }
        uint32_t y = mt[mti++];
        y ^= y >> 11;
        y ^= (y << 7) & 2636928640u;
        y ^= (y << 15) & 4022730752u;
        y ^= y >> 18;
        return y;
    }
    double next_double() {   // numpy rk_double
        uint32_t a = next() >> 5, b = next() >> 6;
        return (a * 67108864.0 + b) / 9007199254740992.0;
    }
};

extern "C" {

// out: (n_rows, size) int64.  Returns the number of doubles consumed
// (callers re-sync numpy's global stream by drawing that many), or -1
// if the sampling cannot terminate (fewer than `size` positive weights).
// out_state (nullable): 625 uint32 slots receiving the final MT19937
// state (624 key words + position) so callers can np.random.set_state
// instead of re-drawing `draws` doubles to fast-forward.
int64_t vtpu_choice_noreplace_rows2(uint32_t seed, int64_t n_rows,
                                    int64_t pop, int64_t size,
                                    const double* p_in, int64_t* out,
                                    uint32_t* out_state);

int64_t vtpu_choice_noreplace_rows(uint32_t seed, int64_t n_rows,
                                   int64_t pop, int64_t size,
                                   const double* p_in, int64_t* out) {
    return vtpu_choice_noreplace_rows2(seed, n_rows, pop, size, p_in, out,
                                       nullptr);
}

}  // extern "C"

namespace {

// Core of the numpy-parity sampler.  Bit-identical to the original
// transcription of numpy's rejection loop, with pure-speed changes
// that cannot alter results: the round-1 cdf (cumsum(p)/tot with
// nothing zeroed yet) is identical for every row so it is computed
// once by the caller; the per-row p reset restores only the entries
// this row zeroed; the redundant per-row seen memset is dropped (seen
// is cleared entry-by-entry at each row end); and every searchsorted
// runs BRANCHLESS (round 5) -- the data-dependent comparisons compile
// to cmov, removing the mispredict stall that dominated the branchy
// binary search (measured 1.5x on the whole replay; selections are
// identical, only the search strategy changed).
int64_t choice_rows_core(Mt19937& rng, int64_t n_rows, int64_t pop,
                         int64_t size, const double* p_in,
                         const double* cdf0, int64_t* out) {
    std::vector<double> p(p_in, p_in + pop), cdf(pop), x((size_t)size);
    std::vector<unsigned char> seen((size_t)pop, 0);
    // bucket index over the shared round-1 cdf: ~79% of all draws hit
    // round 1; r = #{j: cdf0[j] <= xv} lies in [bstart[b], bstart[b+1]]
    // for xv in bucket b (exact bounds by construction), and a short
    // branchless count inside that window finds it.
    constexpr int64_t NB = 4096;
    std::vector<int32_t> bstart((size_t)NB + 1);
    {
        int64_t j = 0;
        for (int64_t b = 0; b < NB; ++b) {
            double thr = (double)b / (double)NB;
            while (j < pop && cdf0[j] <= thr) ++j;
            bstart[(size_t)b] = (int32_t)j;
        }
        bstart[(size_t)NB] = (int32_t)pop;
    }
    int64_t draws = 0;
    for (int64_t r = 0; r < n_rows; ++r) {
        int64_t* found = out + r * size;
        int64_t n_uniq = 0;
        bool first_round = true;
        while (n_uniq < size) {
            int64_t m = size - n_uniq;
            for (int64_t i = 0; i < m; ++i) x[(size_t)i] = rng.next_double();
            draws += m;
            const double* cdf_use;
            if (first_round) {
                first_round = false;
                for (int64_t i = 0; i < m; ++i) {
                    // searchsorted side='right' via the bucket window
                    double xv = x[(size_t)i];
                    int64_t b = (int64_t)(xv * (double)NB);
                    if (b < 0) b = 0;
                    if (b >= NB) b = NB - 1;
                    int64_t base = bstart[(size_t)b];
                    int64_t n2 = bstart[(size_t)b + 1] - base + 1;
                    while (n2 > 1) {
                        int64_t half = n2 >> 1;
                        base += (cdf0[(size_t)(base + half - 1)] <= xv)
                            ? half : 0;
                        n2 -= half;
                    }
                    int64_t lo = base;
                    if (lo < pop && !seen[(size_t)lo]) {
                        seen[(size_t)lo] = 1;
                        found[n_uniq++] = lo;
                    }
                }
                continue;
            }
            for (int64_t i = 0; i < n_uniq; ++i) p[(size_t)found[i]] = 0.0;
            double acc = 0.0;
            for (int64_t j = 0; j < pop; ++j) { acc += p[(size_t)j]; cdf[(size_t)j] = acc; }
            double tot = cdf[(size_t)pop - 1];
            for (int64_t j = 0; j < pop; ++j) cdf[(size_t)j] /= tot;
            cdf_use = cdf.data();
            for (int64_t i = 0; i < m; ++i) {
                // searchsorted side='right' as a branchless count
                // lo = #{j : cdf[j] <= xv}
                double xv = x[(size_t)i];
                int64_t base = 0, n2 = pop;
                while (n2 > 1) {
                    int64_t half = n2 >> 1;
                    base += (cdf_use[(size_t)(base + half - 1)] <= xv)
                        ? half : 0;
                    n2 -= half;
                }
                int64_t lo = base + (cdf_use[(size_t)base] <= xv);
                // dedup: keep first occurrences in draw order (numpy's
                // unique(return_index) + sorted indices + take)
                if (lo < pop && !seen[(size_t)lo]) {
                    seen[(size_t)lo] = 1;
                    found[n_uniq++] = lo;
                }
            }
        }
        for (int64_t i = 0; i < n_uniq; ++i) {
            seen[(size_t)found[i]] = 0;
            p[(size_t)found[i]] = p_in[(size_t)found[i]];
        }
    }
    return draws;
}

void make_cdf0(const double* p_in, int64_t pop, std::vector<double>& cdf0) {
    cdf0.resize((size_t)pop);
    double acc = 0.0;
    for (int64_t j = 0; j < pop; ++j) { acc += p_in[j]; cdf0[(size_t)j] = acc; }
    double tot = cdf0[(size_t)pop - 1];
    for (int64_t j = 0; j < pop; ++j) cdf0[(size_t)j] /= tot;
}

}  // namespace

extern "C" {

int64_t vtpu_choice_noreplace_rows2(uint32_t seed, int64_t n_rows,
                                    int64_t pop, int64_t size,
                                    const double* p_in, int64_t* out,
                                    uint32_t* out_state) {
    int64_t positive = 0;
    for (int64_t j = 0; j < pop; ++j) positive += p_in[j] > 0;
    if (positive < size) return -1;
    Mt19937 rng(seed);
    std::vector<double> cdf0;
    make_cdf0(p_in, pop, cdf0);
    int64_t draws = choice_rows_core(rng, n_rows, pop, size, p_in,
                                     cdf0.data(), out);
    if (out_state) {
        for (int i = 0; i < 624; ++i) out_state[i] = rng.mt[i];
        out_state[624] = (uint32_t)rng.mti;
    }
    return draws;
}

// Resumable variant for chunked row production: state625 (624 MT19937
// key words + position) is read, advanced, and written back, so a
// caller can interleave sampling with uploads of finished row chunks.
// Initialize the state with vtpu_mt19937_seed.
void vtpu_mt19937_seed(uint32_t seed, uint32_t* state625) {
    Mt19937 rng(seed);
    for (int i = 0; i < 624; ++i) state625[i] = rng.mt[i];
    state625[624] = (uint32_t)rng.mti;
}

int64_t vtpu_choice_noreplace_resume(uint32_t* state625, int64_t n_rows,
                                     int64_t pop, int64_t size,
                                     const double* p_in, int64_t* out) {
    int64_t positive = 0;
    for (int64_t j = 0; j < pop; ++j) positive += p_in[j] > 0;
    if (positive < size) return -1;
    Mt19937 rng(0);
    for (int i = 0; i < 624; ++i) rng.mt[i] = state625[i];
    rng.mti = (int)state625[624];
    std::vector<double> cdf0;
    make_cdf0(p_in, pop, cdf0);
    int64_t draws = choice_rows_core(rng, n_rows, pop, size, p_in,
                                     cdf0.data(), out);
    for (int i = 0; i < 624; ++i) state625[i] = rng.mt[i];
    state625[624] = (uint32_t)rng.mti;
    return draws;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// BAM sort by aux tag (the `samtools sort -t CB` equivalent the counting
// pipeline needs; the reference shells out to samtools, _run.py:169-182)
// ---------------------------------------------------------------------------

namespace {

// Parallel BGZF writer: payload is chunked into <=60000-byte blocks,
// compressed by a thread pool in batches, written in order.
struct BgzfWriter {
    FILE* fp;
    int level;
    int n_threads;
    std::vector<uint8_t> pending;           // uncompressed payload buffer
    uint64_t total_in = 0;                  // uncompressed bytes written

    BgzfWriter(FILE* f, int lvl, int threads)
        : fp(f), level(lvl), n_threads(threads < 1 ? 1 : threads) {}

    static std::vector<uint8_t> compress_block(const uint8_t* p, size_t n,
                                               int level) {
        std::vector<uint8_t> comp(compressBound(n) + 64);
        z_stream zs;
        memset(&zs, 0, sizeof zs);
        deflateInit2(&zs, level, Z_DEFLATED, -15, 8, Z_DEFAULT_STRATEGY);
        zs.next_in = const_cast<uint8_t*>(p);
        zs.avail_in = n;
        zs.next_out = comp.data();
        zs.avail_out = comp.size();
        deflate(&zs, Z_FINISH);
        const size_t clen = zs.total_out;
        deflateEnd(&zs);
        const uint32_t crc = crc32(crc32(0, nullptr, 0), p, n);
        std::vector<uint8_t> out(18 + clen + 8);
        static const uint8_t hdr10[10] = {0x1f, 0x8b, 0x08, 0x04,
                                          0, 0, 0, 0, 0, 0};
        memcpy(out.data(), hdr10, 10);
        const uint16_t xlen = 6;
        const uint16_t bsize = (uint16_t)(18 + clen + 8 - 1);
        out[10] = xlen & 0xff; out[11] = xlen >> 8;
        out[12] = 'B'; out[13] = 'C';
        out[14] = 2; out[15] = 0;
        out[16] = bsize & 0xff; out[17] = bsize >> 8;
        memcpy(out.data() + 18, comp.data(), clen);
        memcpy(out.data() + 18 + clen, &crc, 4);
        const uint32_t isize = n;
        memcpy(out.data() + 18 + clen + 4, &isize, 4);
        return out;
    }

    void flush_blocks(bool final_flush) {
        const size_t BLK = 60000;
        // keep a partial tail block unless final
        size_t nfull = pending.size() / BLK;
        size_t tail = pending.size() - nfull * BLK;
        size_t nblocks = nfull + ((final_flush && tail) ? 1 : 0);
        if (!nblocks) {
            if (final_flush) pending.clear();
            return;
        }
        std::vector<std::vector<uint8_t>> outs(nblocks);
        size_t per = (nblocks + n_threads - 1) / n_threads;
        std::vector<std::thread> ths;
        for (int t = 0; t < n_threads; ++t) {
            size_t lo = t * per, hi = std::min(nblocks, lo + per);
            if (lo >= hi) break;
            ths.emplace_back([&, lo, hi]() {
                for (size_t i = lo; i < hi; ++i) {
                    size_t off = i * BLK;
                    size_t len = std::min(BLK, pending.size() - off);
                    outs[i] = compress_block(pending.data() + off, len,
                                             level);
                }
            });
        }
        for (auto& th : ths) th.join();
        for (auto& o : outs) fwrite(o.data(), 1, o.size(), fp);
        if (final_flush) {
            pending.clear();
        } else {
            pending.erase(pending.begin(), pending.begin() + nfull * BLK);
        }
    }

    void write(const uint8_t* p, size_t n) {
        pending.insert(pending.end(), p, p + n);
        total_in += n;
        if (pending.size() >= (size_t)60000 * n_threads * 4)
            flush_blocks(false);
    }

    void finish() {
        flush_blocks(true);
        static const uint8_t eof_block[28] = {
            0x1f, 0x8b, 0x08, 0x04, 0, 0, 0, 0, 0, 0xff, 0x06, 0x00,
            0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0x00,
            0, 0, 0, 0, 0, 0, 0, 0};
        fwrite(eof_block, 1, 28, fp);
    }
};

// The Z-string value of `tag` inside a raw record blob, or "" if absent.
static std::string tag_value(const uint8_t* rec, size_t len,
                             const char* tag) {
    if (len < 32) return "";
    const uint8_t l_read_name = rec[8];
    const uint16_t n_cigar = rec[12] | (rec[13] << 8);
    int32_t l_seq;
    memcpy(&l_seq, rec + 16, 4);
    const uint8_t* aux = rec + 32 + l_read_name + 4 * (size_t)n_cigar +
        (l_seq + 1) / 2 + l_seq;
    const uint8_t* end = rec + len;
    if (aux > end) return "";
    const uint8_t* t = find_tag(aux, end, tag);
    if (!t || *t != 'Z') return "";
    const char* v = (const char*)(t + 1);
    size_t n = strnlen(v, end - t - 1);
    return std::string(v, n);
}

struct RunReader {
    FILE* fp;
    std::vector<uint8_t> blob;
    std::string key;
    uint64_t seq = 0;
    bool next(const char* tag) {
        uint32_t len;
        if (fread(&len, 4, 1, fp) != 1) return false;
        blob.resize(len);
        if (fread(blob.data(), 1, len, fp) != len) return false;
        key = tag_value(blob.data(), len, tag);
        ++seq;
        return true;
    }
};

}  // namespace

extern "C" {

// Sort a BAM by the given aux tag (stable within equal keys; reads with
// no tag sort first).  Returns number of records, or -1 on error.
// When index_path is non-null, a ".vtx" cell index is written alongside:
// one entry per tag-value CHANGE in the output stream, mapping the tag
// value to the UNCOMPRESSED stream offset of its first record (a record
// boundary), plus a terminal entry (keylen 0) at end-of-records.  The
// index lets multi-feeder counting seek each feeder straight to its
// barcode range (vtpu_bam_seek_uncompressed / vtpu_bam_set_limit).
int64_t vtpu_bam_sort_by_tag_indexed(const char* src, const char* dst,
                                     const char* tag, int64_t mem_limit,
                                     int32_t n_threads, int32_t level,
                                     const char* index_path) {
    BamHandle* h = (BamHandle*)vtpu_bam_open(src);
    if (!h) return -1;
    // re-encode the header (magic, text, refs)
    std::vector<uint8_t> header;
    {
        header.insert(header.end(), {'B', 'A', 'M', 1});
        int32_t l_text = 0;   // header text was not retained by open;
        // re-emit a minimal @HD line + refs (consumers use the ref table)
        std::string text = "@HD\tVN:1.6\tSO:unknown\n";
        l_text = text.size();
        header.insert(header.end(), (uint8_t*)&l_text,
                      (uint8_t*)&l_text + 4);
        header.insert(header.end(), text.begin(), text.end());
        int32_t n_ref = h->refs.size();
        header.insert(header.end(), (uint8_t*)&n_ref,
                      (uint8_t*)&n_ref + 4);
        for (size_t i = 0; i < h->refs.size(); ++i) {
            int32_t l_name = h->refs[i].size() + 1;
            header.insert(header.end(), (uint8_t*)&l_name,
                          (uint8_t*)&l_name + 4);
            header.insert(header.end(), h->refs[i].begin(),
                          h->refs[i].end());
            header.push_back(0);
            int32_t l_ref = (int32_t)h->ref_len[i];
            header.insert(header.end(), (uint8_t*)&l_ref,
                          (uint8_t*)&l_ref + 4);
        }
    }

    struct Rec { size_t key_off; uint32_t key_len;
                 size_t blob_off; uint32_t blob_len; };
    std::vector<uint8_t> arena;   // concatenated record blobs
    std::vector<char> keys;
    std::vector<Rec> recs;
    std::vector<std::string> run_files;
    int64_t total = 0;

    auto flush_run = [&]() -> bool {
        if (recs.empty()) return true;
        std::stable_sort(recs.begin(), recs.end(),
                         [&](const Rec& a, const Rec& b) {
            int c = memcmp(keys.data() + a.key_off, keys.data() + b.key_off,
                           std::min(a.key_len, b.key_len));
            if (c) return c < 0;
            return a.key_len < b.key_len;
        });
        std::string fn = std::string(dst) + ".run" +
            std::to_string(run_files.size());
        FILE* rf = fopen(fn.c_str(), "wb");
        if (!rf) return false;
        for (const Rec& r : recs) {
            fwrite(&r.blob_len, 4, 1, rf);
            fwrite(arena.data() + r.blob_off, 1, r.blob_len, rf);
        }
        fclose(rf);
        run_files.push_back(fn);
        arena.clear(); keys.clear(); recs.clear();
        return true;
    };

    // read all records
    std::vector<uint8_t> rec;
    while (true) {
        int32_t block_size;
        if (!fill(h, 4)) { vtpu_bam_close(h); return -1; }
        if (h->buf.size() - h->buf_pos < 4) break;
        if (!take(h, &block_size, 4)) break;
        if (block_size <= 0) { vtpu_bam_close(h); return -1; }
        rec.resize(block_size);
        if (!take(h, rec.data(), block_size)) {
            vtpu_bam_close(h); return -1;
        }
        std::string key = tag_value(rec.data(), rec.size(), tag);
        Rec r;
        r.key_off = keys.size(); r.key_len = key.size();
        r.blob_off = arena.size(); r.blob_len = rec.size();
        keys.insert(keys.end(), key.begin(), key.end());
        arena.insert(arena.end(), rec.begin(), rec.end());
        recs.push_back(r);
        ++total;
        if ((int64_t)arena.size() > mem_limit) {
            if (!flush_run()) { vtpu_bam_close(h); return -1; }
        }
    }
    vtpu_bam_close(h);

    FILE* out = fopen(dst, "wb");
    if (!out) return -1;
    BgzfWriter w(out, level, n_threads);
    w.write(header.data(), header.size());

    // cell-index entries buffered in memory; the sidecar is written
    // AFTER the BGZF output closes so its header can carry the final
    // compressed file size (the staleness check: a .vtx only matches
    // the exact BAM it was written with)
    struct IxEntry { uint64_t off; std::string key; };
    std::vector<IxEntry> ix_entries;
    std::string ix_prev;
    bool ix_any = false;
    auto ix_entry = [&](const char* k, uint32_t klen) {
        if (!index_path) return;
        if (ix_any && ix_prev.size() == klen &&
            memcmp(ix_prev.data(), k, klen) == 0)
            return;
        ix_entries.push_back({w.total_in, std::string(k, klen)});
        ix_prev.assign(k, klen);
        ix_any = true;
    };

    if (run_files.empty()) {
        // single in-memory run
        std::stable_sort(recs.begin(), recs.end(),
                         [&](const Rec& a, const Rec& b) {
            int c = memcmp(keys.data() + a.key_off, keys.data() + b.key_off,
                           std::min(a.key_len, b.key_len));
            if (c) return c < 0;
            return a.key_len < b.key_len;
        });
        for (const Rec& r : recs) {
            ix_entry(keys.data() + r.key_off, r.key_len);
            int32_t bs = r.blob_len;
            w.write((uint8_t*)&bs, 4);
            w.write(arena.data() + r.blob_off, r.blob_len);
        }
    } else {
        if (!flush_run()) { fclose(out); return -1; }
        // k-way merge of the runs
        std::vector<RunReader> readers(run_files.size());
        for (size_t i = 0; i < run_files.size(); ++i) {
            readers[i].fp = fopen(run_files[i].c_str(), "rb");
            if (!readers[i].fp) { fclose(out); return -1; }
        }
        using HeapItem = std::pair<std::pair<std::string, size_t>, size_t>;
        auto cmp = [](const HeapItem& a, const HeapItem& b) {
            return a.first > b.first;   // min-heap on (key, run index)
        };
        std::priority_queue<HeapItem, std::vector<HeapItem>,
                            decltype(cmp)> heap(cmp);
        for (size_t i = 0; i < readers.size(); ++i)
            if (readers[i].next(tag))
                heap.push({{readers[i].key, i}, i});
        while (!heap.empty()) {
            size_t i = heap.top().second;
            heap.pop();
            ix_entry(readers[i].key.data(), readers[i].key.size());
            int32_t bs = readers[i].blob.size();
            w.write((uint8_t*)&bs, 4);
            w.write(readers[i].blob.data(), readers[i].blob.size());
            if (readers[i].next(tag))
                heap.push({{readers[i].key, i}, i});
        }
        for (size_t i = 0; i < readers.size(); ++i) fclose(readers[i].fp);
        for (const auto& fn : run_files) remove(fn.c_str());
    }
    const uint64_t end_off = w.total_in;
    w.finish();
    fclose(out);
    if (index_path) {
        FILE* ixf = fopen(index_path, "wb");
        if (ixf) {
            fwrite("VTX2", 1, 4, ixf);
            FILE* chk = fopen(dst, "rb");
            uint64_t bam_size = 0;
            if (chk) {
                fseek(chk, 0, SEEK_END);
                bam_size = (uint64_t)ftell(chk);
                fclose(chk);
            }
            fwrite(&bam_size, 8, 1, ixf);
            for (const IxEntry& e : ix_entries) {
                const uint32_t klen = (uint32_t)e.key.size();
                fwrite(&klen, 4, 1, ixf);
                fwrite(&e.off, 8, 1, ixf);
                fwrite(e.key.data(), 1, e.key.size(), ixf);
            }
            const uint32_t sentinel = 0xFFFFFFFFu;   // terminal entry
            fwrite(&sentinel, 4, 1, ixf);
            fwrite(&end_off, 8, 1, ixf);
            fclose(ixf);
        }
    }
    return total;
}

int64_t vtpu_bam_sort_by_tag(const char* src, const char* dst,
                             const char* tag, int64_t mem_limit,
                             int32_t n_threads, int32_t level) {
    return vtpu_bam_sort_by_tag_indexed(src, dst, tag, mem_limit,
                                        n_threads, level, nullptr);
}

}  // extern "C"
