// Parallel compression codec for the NTIO tensor container.
//
// Native counterpart of the reference's C++ IO layer (cpp/io/TensorIO.*,
// VoxelBlockGridIO.* — zlib-compressed tensor blobs). The hot path of
// checkpointing a TSDF volume is compressing hundreds of MB of voxel data;
// single-stream zlib runs ~50 MB/s, so this codec splits the buffer into
// independent chunks compressed on a thread pool (format below), giving
// near-linear scaling with cores while staying pure-zlib per chunk.
//
// Chunked format (little-endian):
//   u32 magic 'NTCZ' | u32 chunk_size | u32 n_chunks | u64 raw_size
//   u64 compressed_size[n_chunks] | payload...
//
// Exposed via a C ABI for ctypes (no pybind11 in this environment).

#include <zlib.h>

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x4E54435A;  // 'NTCZ'

struct Header {
    uint32_t magic;
    uint32_t chunk_size;
    uint32_t n_chunks;
    uint32_t reserved;
    uint64_t raw_size;
};

void compress_chunk(const uint8_t* src, size_t src_len, uint8_t* dst,
                    size_t dst_cap, int level, uint64_t* out_len) {
    uLongf len = static_cast<uLongf>(dst_cap);
    int rc = compress2(dst, &len, src, static_cast<uLong>(src_len), level);
    *out_len = (rc == Z_OK) ? len : 0;
}

}  // namespace

extern "C" {

// Upper bound on the compressed size for a raw buffer of n bytes.
uint64_t ntio_compress_bound(uint64_t n, uint32_t chunk_size) {
    uint64_t n_chunks = (n + chunk_size - 1) / chunk_size;
    if (n_chunks == 0) n_chunks = 1;
    return sizeof(Header) + n_chunks * sizeof(uint64_t) +
           n_chunks * compressBound(chunk_size);
}

// Compress src[0..n) into dst; returns total bytes written, 0 on failure.
uint64_t ntio_compress(const uint8_t* src, uint64_t n, uint8_t* dst,
                       uint64_t dst_cap, int level, uint32_t chunk_size,
                       int32_t n_threads) {
    if (chunk_size == 0) chunk_size = 1 << 22;
    uint64_t n_chunks = (n + chunk_size - 1) / chunk_size;
    if (n_chunks == 0) n_chunks = 1;
    const uint64_t per_chunk_cap = compressBound(chunk_size);
    const uint64_t table_off = sizeof(Header);
    const uint64_t payload_off = table_off + n_chunks * sizeof(uint64_t);
    if (dst_cap < payload_off + n_chunks * per_chunk_cap) return 0;

    Header hdr{kMagic, chunk_size, static_cast<uint32_t>(n_chunks), 0, n};
    std::memcpy(dst, &hdr, sizeof(hdr));
    std::vector<uint64_t> sizes(n_chunks, 0);

    // scratch area: compress each chunk at a fixed stride, compact after
    std::vector<std::thread> workers;
    if (n_threads <= 0) {
        n_threads = static_cast<int32_t>(std::thread::hardware_concurrency());
        if (n_threads <= 0) n_threads = 4;
    }
    uint8_t* payload = dst + payload_off;
    auto work = [&](uint64_t begin, uint64_t end) {
        for (uint64_t c = begin; c < end; ++c) {
            uint64_t off = c * static_cast<uint64_t>(chunk_size);
            uint64_t len = (off + chunk_size <= n) ? chunk_size : (n - off);
            compress_chunk(src + off, len, payload + c * per_chunk_cap,
                           per_chunk_cap, level, &sizes[c]);
        }
    };
    uint64_t per_thread = (n_chunks + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        uint64_t b = t * per_thread;
        uint64_t e = b + per_thread > n_chunks ? n_chunks : b + per_thread;
        if (b >= e) break;
        workers.emplace_back(work, b, e);
    }
    for (auto& w : workers) w.join();

    for (uint64_t c = 0; c < n_chunks; ++c) {
        if (sizes[c] == 0 && ((c * (uint64_t)chunk_size) < n)) return 0;
    }
    // compact payload in place (front to back keeps copies non-overlapping
    // safe since compressed <= stride)
    uint64_t write = 0;
    for (uint64_t c = 0; c < n_chunks; ++c) {
        std::memmove(payload + write, payload + c * per_chunk_cap, sizes[c]);
        write += sizes[c];
    }
    std::memcpy(dst + table_off, sizes.data(), n_chunks * sizeof(uint64_t));
    return payload_off + write;
}

// Raw (decompressed) size of an NTCZ buffer; 0 if invalid.
uint64_t ntio_raw_size(const uint8_t* src, uint64_t n) {
    if (n < sizeof(Header)) return 0;
    Header hdr;
    std::memcpy(&hdr, src, sizeof(hdr));
    if (hdr.magic != kMagic) return 0;
    return hdr.raw_size;
}

// Decompress; returns raw bytes written, 0 on failure.
uint64_t ntio_decompress(const uint8_t* src, uint64_t n, uint8_t* dst,
                         uint64_t dst_cap, int32_t n_threads) {
    if (n < sizeof(Header)) return 0;
    Header hdr;
    std::memcpy(&hdr, src, sizeof(hdr));
    if (hdr.magic != kMagic || dst_cap < hdr.raw_size) return 0;
    uint64_t n_chunks = hdr.n_chunks;
    std::vector<uint64_t> sizes(n_chunks);
    std::memcpy(sizes.data(), src + sizeof(Header), n_chunks * sizeof(uint64_t));
    std::vector<uint64_t> offsets(n_chunks, 0);
    uint64_t off = sizeof(Header) + n_chunks * sizeof(uint64_t);
    for (uint64_t c = 0; c < n_chunks; ++c) {
        offsets[c] = off;
        off += sizes[c];
    }
    if (off > n) return 0;

    if (n_threads <= 0) {
        n_threads = static_cast<int32_t>(std::thread::hardware_concurrency());
        if (n_threads <= 0) n_threads = 4;
    }
    std::vector<int> ok(n_chunks, 1);
    auto work = [&](uint64_t begin, uint64_t end) {
        for (uint64_t c = begin; c < end; ++c) {
            uint64_t raw_off = c * static_cast<uint64_t>(hdr.chunk_size);
            uint64_t raw_len = (raw_off + hdr.chunk_size <= hdr.raw_size)
                                   ? hdr.chunk_size
                                   : hdr.raw_size - raw_off;
            uLongf out_len = static_cast<uLongf>(raw_len);
            int rc = uncompress(dst + raw_off, &out_len, src + offsets[c],
                                static_cast<uLong>(sizes[c]));
            ok[c] = (rc == Z_OK && out_len == raw_len);
        }
    };
    std::vector<std::thread> workers;
    uint64_t per_thread = (n_chunks + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        uint64_t b = t * per_thread;
        uint64_t e = b + per_thread > n_chunks ? n_chunks : b + per_thread;
        if (b >= e) break;
        workers.emplace_back(work, b, e);
    }
    for (auto& w : workers) w.join();
    for (uint64_t c = 0; c < n_chunks; ++c)
        if (!ok[c]) return 0;
    return hdr.raw_size;
}

}  // extern "C"
