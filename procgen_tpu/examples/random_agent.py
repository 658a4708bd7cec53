"""Random agent over the gym3-style API (reference: procgen/examples)."""

import numpy as np

from procgen_tpu import ProcgenGym3Env


def main():
    env = ProcgenGym3Env(num=2, env_name="coinrun", distribution_mode="easy")
    step = 0
    for _ in range(100):
        env.act(np.random.randint(0, 15, size=env.num))
        rew, obs, first = env.observe()
        print(f"step {step} reward {rew} first {first}")
        step += 1


if __name__ == "__main__":
    main()
