// Native replacement for the reference's cheerputils.cpp, which uses the
// Cheerp builtin __builtin_cheerp_make_regular to view a JS typed array as a
// raw pointer (miner.cpp:3 #includes this file directly).  The stub
// Int32Array is vector-backed, so a plain pointer offset suffices.
#include <cheerp/client.h>

int *createData(client::Int32Array *a, int offset) {
    return a->data() + offset;
}
