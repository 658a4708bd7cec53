// Native driver for the logic-only build of the reference engine — the
// behavior ORACLE for procgen_tpu conformance testing.
//
// Replicates exactly the per-env construction and stepping that the upstream
// VecGame performs (reference: procgen/src/vecgame.cpp:169-379 ctor seeding,
// :399-401 initial reset, :426-449 act loop, game.cpp:136-171 step), but
// single-threaded and without buffers: observations are skipped (QPainter is
// a no-op shim) and rewards/dones/seeds/latents are read back from the
// recording GameState stub after every step.
//
// Protocol:
//   ./refengine --env-name maze[,heist,...] --num 2 --rand-seed 23 \
//       --num-levels 0 --start-level 0 --distribution-mode 0 [--latents] \
//       [game option flags below]
// stdin:  one line per step: num space-separated int actions (-1 = force reset)
// stdout: line 0:    {"init": {"level_seeds": [...], ...latents}}
//         per step:  {"rewards": [...], "firsts": [...], "level_seeds": [...],
//                     "prev_level_seeds": [...], "prev_level_completes": [...],
//                     ...latents}
// Floats are printed with %.9g (exact float32 round-trip).

#include <cinttypes>
#include <cstdio>
#include <cstring>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

// debug introspection of protected members (agent/entities) — harness only
#define protected public
#include "basic-abstract-game.h"
#undef protected
#include "game-registry.h"
#include "game.h"
#include "resources.h"
#include "vecoptions.h"

void coinrun_old_init(int rand_seed);

// FNV-1a, identical to vecgame.cpp:156-167 (std::hash is not cross-platform).
static inline uint32_t hash_str_uint32(const std::string &str) {
    uint32_t hash = 0x811c9dc5;
    uint32_t prime = 0x1000193;
    for (size_t i = 0; i < str.size(); i++) {
        uint8_t value = str[i];
        hash = hash ^ value;
        hash *= prime;
    }
    return hash;
}

static std::vector<std::string> split_names(const std::string &s) {
    std::vector<std::string> out;
    std::stringstream ss(s);
    std::string item;
    while (std::getline(ss, item, ',')) {
        out.push_back(item);
    }
    return out;
}

struct Args {
    std::string env_name = "maze";
    int num = 1;
    int rand_seed = 0;
    int num_levels = 0;
    int start_level = 0;
    int distribution_mode = 1; // HardMode
    bool latents = false;
    bool dump_states = false;
    std::string load_states;  // file of per-env hex WriteBuffer blobs
    bool debug_agent = false;
    bool debug_ents = false;
    // game options consumed by Game::parse_options (game.cpp:62-95)
    bool paint_vel_info = false;
    bool use_generated_assets = false;
    bool use_monochrome_assets = false;
    bool restrict_themes = false;
    bool use_backgrounds = true;
    bool center_agent = false;
    bool use_sequential_levels = false;
    bool use_easy_jump = false;
    int plain_assets = 0;
    int physics_mode = 0;
    int debug_mode = 0;
    int game_type = 0;
};

static Args parse_args(int argc, char **argv) {
    Args a;
    for (int i = 1; i < argc; i++) {
        std::string k = argv[i];
        auto next_int = [&]() { return std::stoi(argv[++i]); };
        auto next_str = [&]() { return std::string(argv[++i]); };
        if (k == "--env-name")
            a.env_name = next_str();
        else if (k == "--num")
            a.num = next_int();
        else if (k == "--rand-seed")
            a.rand_seed = next_int();
        else if (k == "--num-levels")
            a.num_levels = next_int();
        else if (k == "--start-level")
            a.start_level = next_int();
        else if (k == "--distribution-mode")
            a.distribution_mode = next_int();
        else if (k == "--latents")
            a.latents = true;
        else if (k == "--dump-states")
            a.dump_states = true;
        else if (k == "--load-states")
            a.load_states = next_str();
        else if (k == "--debug-agent")
            a.debug_agent = true;
        else if (k == "--debug-ents")
            a.debug_ents = true;
        else if (k == "--paint-vel-info")
            a.paint_vel_info = true;
        else if (k == "--use-generated-assets")
            a.use_generated_assets = true;
        else if (k == "--use-monochrome-assets")
            a.use_monochrome_assets = true;
        else if (k == "--restrict-themes")
            a.restrict_themes = true;
        else if (k == "--no-backgrounds")
            a.use_backgrounds = false;
        else if (k == "--center-agent")
            a.center_agent = true;
        else if (k == "--use-sequential-levels")
            a.use_sequential_levels = true;
        else if (k == "--use-easy-jump")
            a.use_easy_jump = true;
        else if (k == "--debug-mode")
            a.debug_mode = next_int();
        else {
            fprintf(stderr, "unknown arg %s\n", k.c_str());
            exit(2);
        }
    }
    return a;
}

static VecOptions make_game_options(const Args &a) {
    // Only the keys Game::parse_options consumes; VecGame-level keys
    // (env_name, num_levels, ...) are handled by this driver directly, the
    // same split as vecgame.cpp:183-190 vs game.cpp:62-95.
    VecOptions o;
    o.add_bool("use_easy_jump", a.use_easy_jump);
    o.add_bool("paint_vel_info", a.paint_vel_info);
    o.add_bool("use_generated_assets", a.use_generated_assets);
    o.add_bool("use_monochrome_assets", a.use_monochrome_assets);
    o.add_bool("restrict_themes", a.restrict_themes);
    o.add_bool("use_backgrounds", a.use_backgrounds);
    o.add_bool("center_agent", a.center_agent);
    o.add_bool("use_sequential_levels", a.use_sequential_levels);
    o.add_int("distribution_mode", a.distribution_mode);
    o.add_int("plain_assets", a.plain_assets);
    o.add_int("physics_mode", a.physics_mode);
    o.add_int("debug_mode", a.debug_mode);
    o.add_int("game_type", a.game_type);
    return o;
}

static void print_latents(const std::vector<Game *> &games) {
    printf(", \"grid_widths\": [");
    for (size_t e = 0; e < games.size(); e++)
        printf("%s%d", e ? ", " : "", games[e]->state->grid_width_);
    printf("], \"grid_heights\": [");
    for (size_t e = 0; e < games.size(); e++)
        printf("%s%d", e ? ", " : "", games[e]->state->grid_height_);
    printf("], \"agent_xs\": [");
    for (size_t e = 0; e < games.size(); e++)
        printf("%s%d", e ? ", " : "", games[e]->state->agent_x_);
    printf("], \"agent_ys\": [");
    for (size_t e = 0; e < games.size(); e++)
        printf("%s%d", e ? ", " : "", games[e]->state->agent_y_);
    printf("], \"exit_xs\": [");
    for (size_t e = 0; e < games.size(); e++)
        printf("%s%d", e ? ", " : "", games[e]->state->exit_x_);
    printf("], \"exit_ys\": [");
    for (size_t e = 0; e < games.size(); e++)
        printf("%s%d", e ? ", " : "", games[e]->state->exit_y_);
    printf("], \"grids\": [");
    for (size_t e = 0; e < games.size(); e++) {
        auto *g = games[e]->state->grid_;
        printf("%s[", e ? ", " : "");
        if (g != nullptr) {
            int n = games[e]->state->grid_width_ * games[e]->state->grid_height_;
            for (int i = 0; i < n; i++)
                printf("%s%d", i ? "," : "", (*g)[i]);
        }
        printf("]");
    }
    printf("]");
}

int main(int argc, char **argv) {
    Args a = parse_args(argc, argv);

    // global_init (vecgame.cpp:144-153); the resource root feeds real PNG
    // dimensions into asset_aspect_ratios (logic-relevant)
    images_load("/root/reference/procgen/data/assets/");
    coinrun_old_init(a.rand_seed);

    // level-seed range (vecgame.cpp:332-341)
    int level_seed_low = 0;
    int level_seed_high = 0;
    if (a.num_levels == 0) {
        level_seed_low = 0;
        level_seed_high = INT32_MAX;
    } else {
        level_seed_low = a.start_level;
        level_seed_high = a.start_level + a.num_levels;
    }

    std::vector<std::string> env_names = split_names(a.env_name);
    int num_joint_games = (int)env_names.size();
    fassert(a.num % num_joint_games == 0);

    RandGen game_level_seed_gen;
    game_level_seed_gen.seed(a.rand_seed);

    std::vector<Game *> games(a.num);
    for (int n = 0; n < a.num; n++) {
        auto name = env_names[n % num_joint_games];
        games[n] = globalGameRegistry->at(name)();
        fassert(games[n]->game_name == name);
        games[n]->level_seed_rand_gen.seed(game_level_seed_gen.randint());
        games[n]->level_seed_high = level_seed_high;
        games[n]->level_seed_low = level_seed_low;
        games[n]->game_n = n;
        games[n]->is_waiting_for_step = false;
        games[n]->parse_options(name, make_game_options(a));
        if (games[n]->fixed_asset_seed == 0) {
            games[n]->fixed_asset_seed = int(hash_str_uint32(name));
        }
        // The recording GameState stub replaces the JS object the Cheerp
        // build allocates (cheerpgame.cpp initGame).
        if (name == "maze") {
            games[n]->state = new client::MazeState();
        } else if (name == "miner") {
            games[n]->state = new client::MinerState();
        } else {
            games[n]->state = new client::GameState();
        }
        games[n]->game_init();
    }

    // initial reset + observe (vecgame.cpp:399-401)
    for (auto *g : games) {
        g->reset();
        g->observe();
        g->initial_reset_complete = true;
    }

    // --load-states: overwrite each game's full state from externally
    // produced reference-layout bytes (the TPU export bridge), exactly as
    // VecGame::set_state does (vecgame.cpp:495-505: deserialize + observe).
    // The construction above ran with whatever --rand-seed the caller gave
    // (typically a DIFFERENT one), so everything must come from the bytes.
    if (!a.load_states.empty()) {
        FILE *f = fopen(a.load_states.c_str(), "r");
        fassert(f != nullptr);
        char *line_buf = nullptr;
        size_t line_cap = 0;
        for (int e = 0; e < a.num; e++) {
            ssize_t len = getline(&line_buf, &line_cap, f);
            fassert(len > 0);
            while (len > 0 && (line_buf[len - 1] == '\n' || line_buf[len - 1] == '\r'))
                line_buf[--len] = 0;
            fassert(len % 2 == 0);
            std::vector<char> raw(len / 2);
            for (ssize_t j = 0; j < len / 2; j++) {
                unsigned v;
                sscanf(line_buf + 2 * j, "%2x", &v);
                raw[j] = (char)v;
            }
            ReadBuffer rb(raw.data(), raw.size());
            games[e]->deserialize(&rb);
            games[e]->observe();
        }
        free(line_buf);
        fclose(f);
    }

    printf("{\"init\": {\"level_seeds\": [");
    for (int e = 0; e < a.num; e++)
        printf("%s%d", e ? ", " : "", games[e]->current_level_seed);
    printf("]");
    if (a.latents)
        print_latents(games);
    printf("}}\n");

    std::string line;
    while (std::getline(std::cin, line)) {
        if (line.empty())
            continue;
        std::stringstream ss(line);
        for (int e = 0; e < a.num; e++) {
            int ac;
            if (!(ss >> ac)) {
                fprintf(stderr, "short action line\n");
                return 2;
            }
            games[e]->action = ac;
            games[e]->step();
        }
        printf("{\"rewards\": [");
        for (int e = 0; e < a.num; e++)
            printf("%s%.9g", e ? ", " : "", games[e]->state->reward_);
        printf("], \"firsts\": [");
        for (int e = 0; e < a.num; e++)
            printf("%s%s", e ? ", " : "", games[e]->state->done_ ? "true" : "false");
        printf("], \"level_seeds\": [");
        for (int e = 0; e < a.num; e++)
            printf("%s%d", e ? ", " : "", games[e]->state->level_seed_);
        printf("], \"prev_level_seeds\": [");
        for (int e = 0; e < a.num; e++)
            printf("%s%d", e ? ", " : "", games[e]->state->prev_level_seed_);
        printf("], \"prev_level_completes\": [");
        for (int e = 0; e < a.num; e++)
            printf("%s%s", e ? ", " : "",
                   games[e]->state->prev_level_complete_ ? "true" : "false");
        printf("]");
        if (a.latents)
            print_latents(games);
        if (a.dump_states) {
            printf(", \"states\": [");
            static std::vector<char> sbuf(1 << 20);
            for (int e = 0; e < a.num; e++) {
                WriteBuffer wb(sbuf.data(), sbuf.size());
                games[e]->serialize(&wb);
                printf("%s\"", e ? ", " : "");
                for (size_t j = 0; j < wb.offset; j++)
                    printf("%02x", (unsigned char)sbuf[j]);
                printf("\"");
            }
            printf("]");
        }
        if (a.debug_agent) {
            // agent kinematics + entity census for physics-divergence hunts
            printf(", \"agents\": [");
            for (int e = 0; e < a.num; e++) {
                auto *bg = dynamic_cast<BasicAbstractGame *>(games[e]);
                printf(
                    "%s[%.9g, %.9g, %.9g, %.9g, %.9g, %zu]", e ? ", " : "",
                    bg->agent->x, bg->agent->y, bg->agent->vx, bg->agent->vy,
                    bg->agent->rx, bg->entities.size());
            }
            printf("]");
        }
        if (a.debug_ents) {
            printf(", \"ents\": [");
            for (int e = 0; e < a.num; e++) {
                auto *bg = dynamic_cast<BasicAbstractGame *>(games[e]);
                printf("%s[", e ? ", " : "");
                for (size_t i = 0; i < bg->entities.size(); i++) {
                    auto &en = bg->entities[i];
                    printf("%s[%d, %.9g, %.9g, %.9g, %.9g, %.9g, %.9g]",
                           i ? ", " : "", en->type, en->x, en->y, en->vx,
                           en->vy, en->rx, en->ry);
                }
                printf("]");
            }
            printf("]");
        }
        printf("}\n");
    }

    for (auto *g : games)
        delete g;
    return 0;
}
