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

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
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

struct BamHandle {
    FILE* fp = nullptr;
    // inflater state over BGZF blocks
    std::vector<uint8_t> inbuf;     // compressed read buffer
    size_t in_pos = 0, in_len = 0;
    std::vector<uint8_t> buf;       // decoded byte stream (rolling)
    size_t buf_pos = 0;             // consume cursor into buf
    bool eof = false;
    std::vector<std::string> refs;
    std::vector<int64_t> ref_len;
};

// Inflate the next BGZF block(s) until `buf` holds >= want bytes past buf_pos
// or EOF.  Returns false on hard error.
static bool fill(BamHandle* h, size_t want) {
    // compact
    if (h->buf_pos > (1u << 20)) {
        h->buf.erase(h->buf.begin(), h->buf.begin() + h->buf_pos);
        h->buf_pos = 0;
    }
    while (h->buf.size() - h->buf_pos < want && !h->eof) {
        // read one BGZF block: 18-byte header with BSIZE
        uint8_t hdr[18];
        size_t got = fread(hdr, 1, 18, h->fp);
        if (got == 0) { h->eof = true; break; }
        if (got < 18 || hdr[0] != 0x1f || hdr[1] != 0x8b) return false;
        const uint16_t xlen = hdr[10] | (hdr[11] << 8);
        // parse extra subfields to find BSIZE
        std::vector<uint8_t> extra(xlen);
        // we already consumed 6 bytes of the extra field in hdr[12..17]
        memcpy(extra.data(), hdr + 12, xlen < 6 ? xlen : 6);
        if (xlen > 6 &&
            fread(extra.data() + 6, 1, xlen - 6, h->fp) != (size_t)(xlen - 6))
            return false;
        int bsize = -1;
        for (size_t p = 0; p + 4 <= extra.size();) {
            const uint8_t si1 = extra[p], si2 = extra[p + 1];
            const uint16_t slen = extra[p + 2] | (extra[p + 3] << 8);
            if (si1 == 'B' && si2 == 'C' && slen == 2)
                bsize = (extra[p + 4] | (extra[p + 5] << 8)) + 1;
            p += 4 + slen;
        }
        if (bsize < 0) return false;
        const int cdata_len = bsize - 18 - xlen + 6 - 8;
        if (cdata_len < 0) return false;
        std::vector<uint8_t> cdata(cdata_len + 8);
        if (fread(cdata.data(), 1, cdata.size(), h->fp) != cdata.size())
            return false;
        uint32_t isize;
        memcpy(&isize, cdata.data() + cdata_len + 4, 4);
        if (isize == 0) continue;  // EOF marker block
        if (isize > 1u << 16) return false;  // BGZF blocks are <= 64 KiB
        const size_t off = h->buf.size();
        h->buf.resize(off + isize);
        z_stream zs;
        memset(&zs, 0, sizeof zs);
        if (inflateInit2(&zs, -15) != Z_OK) return false;
        zs.next_in = cdata.data();
        zs.avail_in = cdata_len;
        zs.next_out = h->buf.data() + off;
        zs.avail_out = isize;
        const int r = inflate(&zs, Z_FINISH);
        inflateEnd(&zs);
        if (r != Z_STREAM_END) return false;
    }
    return true;
}

static bool take(BamHandle* h, void* dst, size_t n) {
    if (!fill(h, n)) return false;
    if (h->buf.size() - h->buf_pos < n) return false;
    memcpy(dst, h->buf.data() + h->buf_pos, n);
    h->buf_pos += n;
    return true;
}

void* vtpu_bam_open(const char* path) {
    BamHandle* h = new BamHandle();
    h->fp = fopen(path, "rb");
    if (!h->fp) { delete h; return nullptr; }
    char magic[4];
    if (!take(h, magic, 4) || memcmp(magic, "BAM\x01", 4) != 0) {
        fclose(h->fp); delete h; return nullptr;
    }
    int32_t l_text;
    if (!take(h, &l_text, 4)) { fclose(h->fp); delete h; return nullptr; }
    std::vector<char> text(l_text);
    if (l_text && !take(h, text.data(), l_text)) {
        fclose(h->fp); delete h; return nullptr;
    }
    int32_t n_ref;
    if (!take(h, &n_ref, 4)) { fclose(h->fp); delete h; return nullptr; }
    for (int32_t i = 0; i < n_ref; ++i) {
        int32_t l_name, l_ref;
        if (!take(h, &l_name, 4)) { fclose(h->fp); delete h; return nullptr; }
        std::vector<char> nm(l_name);
        if (!take(h, nm.data(), l_name)) {
            fclose(h->fp); delete h; return nullptr;
        }
        if (!take(h, &l_ref, 4)) { fclose(h->fp); delete h; return nullptr; }
        h->refs.emplace_back(nm.data());
        h->ref_len.push_back(l_ref);
    }
    return h;
}

void vtpu_bam_close(void* vh) {
    BamHandle* h = (BamHandle*)vh;
    if (h->fp) fclose(h->fp);
    delete h;
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
                            char* bc_buf, char* umi_buf, int require_unique) {
    BamHandle* h = (BamHandle*)vh;
    int64_t count = 0;
    std::vector<uint8_t> rec;
    while (count < max_reads) {
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
        flags_ok[i] = 1;
    }
    return count;
}

}  // extern "C"
