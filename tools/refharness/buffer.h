// Working replacement for the reference's buffer.h, whose int/float bodies
// the Cheerp fork stubbed out (procgen/src/buffer.h:28-34,46-51,97-102,
// 112-117).  Restores the upstream raw little-endian layout so get_state /
// set_state round-trips work in the native harness build.  Copied over
// buffer.h in the patched build tree by tools/refharness/build.py.
#pragma once

#include "cpp-utils.h"
#include <cstring>
#include <string>
#include <vector>

struct ReadBuffer {
    char *data = nullptr;
    size_t offset = 0;
    size_t length = 0;

    ReadBuffer(char *data, size_t length) : data(data), length(length) {}

    bool read_bool() {
        return read_int() > 0;
    }

    std::vector<bool> read_vector_bool() {
        std::vector<bool> v;
        v.resize(read_int());
        for (size_t i = 0; i < v.size(); i++) {
            v[i] = read_bool();
        }
        return v;
    }

    int read_int() {
        fassert(offset + sizeof(int) <= length);
        int d;
        std::memcpy(&d, &data[offset], sizeof(int));
        offset += sizeof(int);
        return d;
    }

    std::vector<int> read_vector_int() {
        std::vector<int> v;
        v.resize(read_int());
        for (size_t i = 0; i < v.size(); i++) {
            v[i] = read_int();
        }
        return v;
    }

    float read_float() {
        fassert(offset + sizeof(float) <= length);
        float d;
        std::memcpy(&d, &data[offset], sizeof(float));
        offset += sizeof(float);
        return d;
    }

    std::vector<float> read_vector_float() {
        std::vector<float> v;
        v.resize(read_int());
        for (size_t i = 0; i < v.size(); i++) {
            v[i] = read_float();
        }
        return v;
    }

    std::string read_string() {
        int size = read_int();
        std::string s(size, '\x00');
        fassert(offset + size <= length);
        std::memcpy(&s[0], data + offset, size);
        offset += s.size();
        return s;
    }
};

struct WriteBuffer {
    char *data = nullptr;
    size_t offset = 0;
    size_t length = 0;

    WriteBuffer(char *data, size_t length) : data(data), length(length) {}

    void write_bool(bool b) {
        write_int(b ? 1 : 0);
    }

    void write_vector_bool(const std::vector<bool> &v) {
        write_int(v.size());
        for (auto i : v) {
            write_bool(i);
        }
    }

    void write_int(int i) {
        fassert(offset + sizeof(int) <= length);
        std::memcpy(&data[offset], &i, sizeof(int));
        offset += sizeof(int);
    }

    void write_vector_int(const std::vector<int> &v) {
        write_int(v.size());
        for (auto i : v) {
            write_int(i);
        }
    }

    void write_float(float f) {
        fassert(offset + sizeof(float) <= length);
        std::memcpy(&data[offset], &f, sizeof(float));
        offset += sizeof(float);
    }

    void write_vector_float(const std::vector<float> &v) {
        write_int(v.size());
        for (auto f : v) {
            write_float(f);
        }
    }

    void write_string(std::string s) {
        fassert(offset + s.size() <= length);
        write_int(s.size());
        std::memcpy(data + offset, s.data(), s.size());
        offset += s.size();
    }
};
