from .plots import (plot_state_estimates, plot_scenarios, plot_pareto_cloud,
                    plot_backtest_curves, select_optimal_index)
from .animation import animate_field, animate_agents

__all__ = ["plot_state_estimates", "plot_scenarios", "plot_pareto_cloud",
           "plot_backtest_curves", "select_optimal_index",
           "animate_field", "animate_agents"]
