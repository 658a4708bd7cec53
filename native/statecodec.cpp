// Native state codec — the C++ side of get_state/set_state.
//
// The reference serializes env state through WriteBuffer/ReadBuffer in C++
// (procgen/src/buffer.h, vecgame.cpp:485-505).  Here the state of record is
// a pytree of batched arrays; this library provides:
//
//   1. pack_states / unpack_states: slice N-leading-axis leaves into per-env
//      blobs (and back) in one pass — the hot path of checkpointing large
//      batches, far faster than a Python per-env per-leaf loop.
//   2. mt19937 text round-trip helpers matching libstdc++'s
//      `ostream << engine` format ("x0 x1 ... x623 pos"), the foundation
//      for byte-level compatibility with the reference's RandGen
//      serialization (randgen.cpp:100-114).
//
// Built as a shared library (see Makefile) and loaded via ctypes
// (procgen_tpu/utils/native_codec.py) with a NumPy fallback.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>

extern "C" {

// Layout description: num_leaves arrays, each with element size (bytes of
// one env's slice) and a pointer to the batched data [num_envs * slice].
// Blobs are laid out per env: magic | per-leaf (u32 len + raw bytes) | end.

static const uint32_t END_OF_BUFFER = 0xCAFECAFE;  // vecgame.cpp:6
static const char MAGIC[8] = {'P', 'G', 'T', 'P', 'U', '0', '0', '1'};

// Returns the blob size per env for the given slice sizes.
int64_t blob_size(const int64_t* slice_sizes, int num_leaves) {
    int64_t total = 8;  // magic
    for (int i = 0; i < num_leaves; i++) {
        total += 4 + slice_sizes[i];
    }
    return total + 4;  // end marker
}

// Packs per-env blobs for all envs at once.
// leaves: array of num_leaves pointers; leaf i has num_envs * slice_sizes[i]
// bytes.  out: num_envs * blob_size bytes.
void pack_states(const uint8_t** leaves, const int64_t* slice_sizes,
                 int num_leaves, int64_t num_envs, uint8_t* out) {
    const int64_t bs = blob_size(slice_sizes, num_leaves);
    for (int64_t e = 0; e < num_envs; e++) {
        uint8_t* p = out + e * bs;
        memcpy(p, MAGIC, 8);
        p += 8;
        for (int i = 0; i < num_leaves; i++) {
            const int64_t sz = slice_sizes[i];
            const uint32_t sz32 = (uint32_t)sz;
            memcpy(p, &sz32, 4);
            p += 4;
            memcpy(p, leaves[i] + e * sz, sz);
            p += sz;
        }
        memcpy(p, &END_OF_BUFFER, 4);
    }
}

// Reverse of pack_states.  Returns 0 on success, nonzero on a malformed
// blob (bad magic / length mismatch / missing end marker at env index).
int64_t unpack_states(const uint8_t* blobs, const int64_t* slice_sizes,
                      int num_leaves, int64_t num_envs, uint8_t** leaves) {
    const int64_t bs = blob_size(slice_sizes, num_leaves);
    for (int64_t e = 0; e < num_envs; e++) {
        const uint8_t* p = blobs + e * bs;
        if (memcmp(p, MAGIC, 8) != 0) return e + 1;
        p += 8;
        for (int i = 0; i < num_leaves; i++) {
            uint32_t sz32;
            memcpy(&sz32, p, 4);
            p += 4;
            if ((int64_t)sz32 != slice_sizes[i]) return e + 1;
            memcpy(leaves[i] + e * slice_sizes[i], p, sz32);
            p += sz32;
        }
        uint32_t marker;
        memcpy(&marker, p, 4);
        if (marker != END_OF_BUFFER) return e + 1;
    }
    return 0;
}

// mt19937 textual serialization, libstdc++ format: 624 state words then the
// position, space separated (randgen.cpp:100-114 serializes this string).
// Returns number of chars written (excluding NUL), or -1 if cap too small.
int64_t mt19937_to_text(const uint32_t* mt, int64_t pos, char* out,
                        int64_t cap) {
    int64_t off = 0;
    for (int i = 0; i < 624; i++) {
        int n = snprintf(out + off, (size_t)(cap - off), i ? " %u" : "%u",
                         mt[i]);
        if (n < 0 || off + n >= cap) return -1;
        off += n;
    }
    int n = snprintf(out + off, (size_t)(cap - off), " %lld",
                     (long long)pos);
    if (n < 0 || off + n >= cap) return -1;
    return off + n;
}

// Parse the textual form back into (mt, pos).  Returns 0 on success.
int64_t mt19937_from_text(const char* text, uint32_t* mt, int64_t* pos) {
    const char* p = text;
    for (int i = 0; i < 624; i++) {
        char* end = nullptr;
        unsigned long v = strtoul(p, &end, 10);
        if (end == p) return 1;
        mt[i] = (uint32_t)v;
        p = end;
    }
    char* end = nullptr;
    long long pp = strtoll(p, &end, 10);
    if (end == p) return 1;
    *pos = (int64_t)pp;
    return 0;
}

// FNV-1a string hash (vecgame.cpp:156-167) — fixed_asset_seed derivation.
uint32_t fnv1a_32(const char* s) {
    uint32_t hash = 0x811c9dc5u;
    for (; *s; s++) {
        hash ^= (uint8_t)(*s);
        hash *= 0x01000193u;
    }
    return hash;
}

}  // extern "C"
