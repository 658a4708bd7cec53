// Native stub of the Cheerp client API, just wide enough to compile the
// reference engine's logic sources under plain g++ (no browser, no JS).
//
// The reference fork targets Cheerp (C++ -> WASM/JS); its sources include
// <cheerp/client.h> for JS interop types (reference: procgen/src/game.h:14,
// resources.h:12, vecoptions.h:13).  This stub provides value-semantics
// replacements so the game LOGIC compiles and runs natively; everything
// render-related is a no-op.  Used only by tools/refharness (the behavior
// oracle for conformance testing) — not part of procgen_tpu itself.
#pragma once

#include <algorithm>
#include <cstdint>
#include <vector>

namespace client {

struct Object {
    virtual ~Object() {}
};

struct String {};
struct Promise {};
struct EventListener {};

// Dummy canvas: the harness never rasterizes; QPainter calls are no-ops.
// getContext/getImageData exist only so the (never-called) canvas_to_rgb888
// in game.cpp:25-42 compiles.
struct ImageData {
    std::vector<double> v;
    std::vector<double> *get_data() { return &v; }
};
struct CanvasRenderingContext2D {
    ImageData *getImageData(int, int, int, int) { return nullptr; }
};
struct HTMLCanvasElement {
    void *getContext(const char *) { return nullptr; }
};
struct HTMLImageElement {};

struct Int32Array {
    std::vector<int32_t> v;
    explicit Int32Array(int n) : v(n) {}
    int32_t &operator[](int i) { return v[i]; }
    const int32_t &operator[](int i) const { return v[i]; }
    int32_t *data() { return v.data(); }
    int size() const { return (int)v.size(); }
};

struct Uint8Array {
    std::vector<uint8_t> v;
    explicit Uint8Array(int n) : v(n) {}
    uint8_t &operator[](int i) { return v[i]; }
};

template <typename T>
struct TArray {
    std::vector<T *> v;
    void push(T *x) { v.push_back(x); }
};

} // namespace client

namespace cheerp {

// maze.cpp:183 / miner.cpp:414 wrap a freshly new'd int32_t[] in a typed
// array; copy it into the stub's vector (caller leaks the raw buffer, same
// as the JS build where GC owns it).
template <typename T>
inline client::Int32Array *MakeTypedArray(T *p, int n) {
    auto *a = new client::Int32Array(n);
    std::copy(p, p + n, a->v.begin());
    return a;
}

} // namespace cheerp
