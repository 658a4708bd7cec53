// Recording replacement for the reference's state.h (procgen/src/state.h).
//
// In the Cheerp build, GameState is a JS object whose setters become property
// writes.  Here it is a concrete native struct: Game::observe() and the
// maze/miner latent-state overrides call the same setters, and the harness
// driver reads the recorded fields back after every step.  This file is
// copied over state.h in the patched build tree by tools/refharness/build.py.
#pragma once

#include <cheerp/client.h>

namespace client {

class GameState : public Object {
  public:
    double reward_ = 0;
    int prev_level_seed_ = 0;
    int level_seed_ = 0;
    bool prev_level_complete_ = false;
    bool done_ = false;
    HTMLCanvasElement *rgb_ = nullptr;

    // Latent-state fields (used by the Maze/Miner subclasses).
    Int32Array *grid_ = nullptr;
    int grid_width_ = 0;
    int grid_height_ = 0;
    int agent_x_ = 0;
    int agent_y_ = 0;
    int exit_x_ = 0;
    int exit_y_ = 0;

    double get_reward() { return reward_; }
    void set_reward(double v) { reward_ = v; }
    int get_prev_level_seed() { return prev_level_seed_; }
    void set_prev_level_seed(int v) { prev_level_seed_ = v; }
    int get_level_seed() { return level_seed_; }
    void set_level_seed(int v) { level_seed_ = v; }
    bool get_prev_level_complete() { return prev_level_complete_; }
    void set_prev_level_complete(bool v) { prev_level_complete_ = v; }
    bool get_done() { return done_; }
    void set_done(bool v) { done_ = v; }
    HTMLCanvasElement *get_rgb() { return rgb_; }
    void set_rgb(HTMLCanvasElement *v) { rgb_ = v; }
};

class MinerState : public GameState {
  public:
    void set_grid(Int32Array *g) { grid_ = g; }
    Int32Array *get_grid() const { return grid_; }
    void set_grid_width(int v) { grid_width_ = v; }
    int get_grid_width() const { return grid_width_; }
    void set_grid_height(int v) { grid_height_ = v; }
    int get_grid_height() const { return grid_height_; }
    void set_agent_x(int v) { agent_x_ = v; }
    int get_agent_x() const { return agent_x_; }
    void set_agent_y(int v) { agent_y_ = v; }
    int get_agent_y() const { return agent_y_; }
    void set_exit_x(int v) { exit_x_ = v; }
    int get_exit_x() const { return exit_x_; }
    void set_exit_y(int v) { exit_y_ = v; }
    int get_exit_y() const { return exit_y_; }
};

class MazeState : public GameState {
  public:
    void set_grid(Int32Array *g) { grid_ = g; }
    void set_grid_width(int v) { grid_width_ = v; }
    void set_grid_height(int v) { grid_height_ = v; }
    void set_agent_x(int v) { agent_x_ = v; }
    void set_agent_y(int v) { agent_y_ = v; }
};

} // namespace client
