// Native replacement for the reference's VecOptions (procgen/src/
// vecoptions.{h,cpp}), whose fork implementation parses a Cheerp JS object.
// Same consume-or-leave / ensure_empty-or-fatal semantics
// (vecoptions.cpp:49-81), backed by a plain tagged key/value list that the
// harness driver fills with add_*().  Copied over vecoptions.h in the
// patched build tree by tools/refharness/build.py.
#pragma once

#include <cstdint>
#include <string>
#include <vector>

class VecOptions {
  public:
    VecOptions() {}

    void add_string(const std::string &name, const std::string &v);
    void add_int(const std::string &name, int32_t v);
    void add_bool(const std::string &name, bool v);

    void consume_string(std::string name, std::string *value);
    void consume_int(std::string name, int32_t *value);
    void consume_bool(std::string name, bool *value);
    void ensure_empty();

  private:
    enum Kind { KIND_STRING, KIND_INT, KIND_BOOL };
    struct Opt {
        std::string name;
        Kind kind;
        std::string sval;
        int32_t ival;
    };
    std::vector<Opt> m_options;
    bool find_and_erase(const std::string &name, Kind kind, Opt *out);
};
