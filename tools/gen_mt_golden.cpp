// Golden-value generator for the MT19937-compatible JAX RNG.
//
// Emits JSON with raw std::mt19937 draws plus the derived helper sequences
// (randint / randn / rand01 / randrange) exactly as the reference RandGen
// computes them (/root/reference/procgen/src/randgen.cpp:6-33).  The JSON is
// committed as tests/data/mt_golden.json and pinned by tests/test_rng.py.
//
// Build & run:  g++ -O2 -std=c++17 tools/gen_mt_golden.cpp -o /tmp/gen_mt && /tmp/gen_mt > tests/data/mt_golden.json

#include <cstdint>
#include <cstdio>
#include <random>
#include <vector>

static void emit_u32_seq(const char *name, int seed, int n) {
    std::mt19937 gen(seed);
    printf("  \"%s\": [", name);
    for (int i = 0; i < n; i++) {
        printf("%s%u", i ? ", " : "", (uint32_t)gen());
    }
    printf("]");
}

int main() {
    printf("{\n");

    // Raw tempered outputs for several seeds, enough to cross two twist
    // boundaries (624-word blocks).
    int seeds[] = {0, 1, 42, 1949448038, 2147483647};
    char buf[64];
    for (int s : seeds) {
        snprintf(buf, sizeof(buf), "raw_seed_%d", s);
        emit_u32_seq(buf, s, 1400);
        printf(",\n");
    }

    // randint(low, high) = low + x % (high - low)
    {
        std::mt19937 gen(7);
        printf("  \"randint_lo3_hi17_seed7\": [");
        for (int i = 0; i < 256; i++) {
            uint32_t x = gen();
            uint32_t range = 17 - 3;
            printf("%s%d", i ? ", " : "", 3 + (int)(x % range));
        }
        printf("],\n");
    }

    // randn(high) = x % high
    {
        std::mt19937 gen(9);
        printf("  \"randn_10_seed9\": [");
        for (int i = 0; i < 256; i++) {
            uint32_t x = gen();
            printf("%s%d", i ? ", " : "", (int)(x % 10u));
        }
        printf("],\n");
    }

    // rand01() = (float)((double)x / ((double)max + 1)); emit the exact f32
    // bit pattern so the comparison is bit-for-bit.
    {
        std::mt19937 gen(23);
        printf("  \"rand01_bits_seed23\": [");
        for (int i = 0; i < 256; i++) {
            uint32_t x = gen();
            float f = (float)((double)(x) / ((double)(gen.max()) + 1));
            uint32_t bits;
            __builtin_memcpy(&bits, &f, 4);
            printf("%s%u", i ? ", " : "", bits);
        }
        printf("],\n");
    }

    // randrange(low, high) = rand01() * (high - low) + low, f32 bit patterns.
    {
        std::mt19937 gen(31);
        printf("  \"randrange_bits_seed31\": [");
        for (int i = 0; i < 256; i++) {
            uint32_t x = gen();
            float r01 = (float)((double)(x) / ((double)(gen.max()) + 1));
            float f = r01 * (2.5f - (-1.5f)) + (-1.5f);
            uint32_t bits;
            __builtin_memcpy(&bits, &f, 4);
            printf("%s%u", i ? ", " : "", bits);
        }
        printf("],\n");
    }

    // State after reseeding mid-stream (seed is stateless reset).
    {
        std::mt19937 gen(5);
        for (int i = 0; i < 100; i++) gen();
        gen.seed(77);
        printf("  \"reseed_77_after_100_draws_of_5\": [");
        for (int i = 0; i < 64; i++) {
            printf("%s%u", i ? ", " : "", (uint32_t)gen());
        }
        printf("]\n");
    }

    printf("}\n");
    return 0;
}
