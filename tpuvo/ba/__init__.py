from tpuvo.ba.window import BAProblem, ba_solve, build_problem_from_vo, linearize_ba

__all__ = ["BAProblem", "ba_solve", "build_problem_from_vo", "linearize_ba"]
