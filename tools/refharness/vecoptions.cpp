#include "vecoptions.h"
#include "cpp-utils.h"

void VecOptions::add_string(const std::string &name, const std::string &v) {
    m_options.push_back({name, KIND_STRING, v, 0});
}

void VecOptions::add_int(const std::string &name, int32_t v) {
    m_options.push_back({name, KIND_INT, "", v});
}

void VecOptions::add_bool(const std::string &name, bool v) {
    m_options.push_back({name, KIND_BOOL, "", v ? 1 : 0});
}

bool VecOptions::find_and_erase(const std::string &name, Kind kind, Opt *out) {
    for (size_t i = 0; i < m_options.size(); i++) {
        if (m_options[i].name == name) {
            fassert(m_options[i].kind == kind);
            *out = m_options[i];
            m_options.erase(m_options.begin() + i);
            return true;
        }
    }
    return false;
}

void VecOptions::consume_string(std::string name, std::string *value) {
    Opt o;
    if (find_and_erase(name, KIND_STRING, &o)) {
        *value = o.sval;
    }
}

void VecOptions::consume_int(std::string name, int32_t *value) {
    Opt o;
    if (find_and_erase(name, KIND_INT, &o)) {
        *value = o.ival;
    }
}

void VecOptions::consume_bool(std::string name, bool *value) {
    Opt o;
    if (find_and_erase(name, KIND_BOOL, &o)) {
        *value = o.ival != 0;
    }
}

void VecOptions::ensure_empty() {
    for (const auto &o : m_options) {
        fatal("unused option %s\n", o.name.c_str());
    }
}
