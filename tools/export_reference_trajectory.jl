# Export a Morbit.jl reference trajectory in the morbit_tpu parity format.
#
# Run where a Julia runtime with Morbit.jl is available (this container has
# none; see morbit_tpu/utils/parity.py for the comparator):
#
#   julia tools/export_reference_trajectory.jl CONFIG out.json
#
# CONFIG selects a BASELINE.json scenario:
#   1  two-parabolas 2D, exact objectives, unconstrained
#   2  two-parabolas 2D, RbfConfig(multiquadric) objectives
#   3  ZDT1 n=10, RbfConfig(cubic) objectives
#   4  two-parabolas with linear + NL inequality constraints (filter flow)
#   ps two-parabolas, exact objectives, Pascoletti-Serafini descent at the
#      DEFAULT subsolver budgets (500*(n+1) global, no polish — matched by
#      morbit_tpu round 4, descent.jl:414-432)
#
# Keep the JSON keys in sync with morbit_tpu.utils.parity. The comparator
# target is 1e-8 on iterates (BASELINE.json).

using Morbit
import JSON

config = length(ARGS) >= 2 ? ARGS[1] : "1"
out = ARGS[end]

f1 = x -> sum((x .- 1) .^ 2)
f2 = x -> sum((x .+ 1) .^ 2)
g1 = x -> 2 .* (x .- 1)
g2 = x -> 2 .* (x .+ 1)
x0_2d = [-3.141592653589793, 2.71828]

function zdt1(n)
    F1 = x -> x[1]
    G = x -> 1 + 9 * sum(x[2:end]) / (n - 1)
    F2 = x -> G(x) * (1 - sqrt(x[1] / G(x)))
    return F1, F2
end

mop, x0, kwargs = if config == "1"
    m = MOP(2)
    add_exact_objective!(m, f1; gradients = g1)
    add_exact_objective!(m, f2; gradients = g2)
    m, x0_2d, Dict(:max_iter => 20)
elseif config == "2"
    m = MOP(2)
    cfg = RbfConfig(; kernel = :multiquadric)
    add_objective!(m, f1; model_cfg = cfg)
    add_objective!(m, f2; model_cfg = cfg)
    m, x0_2d, Dict(:max_iter => 15)
elseif config == "3"
    n = 10
    m = MOP(zeros(n), ones(n))
    F1, F2 = zdt1(n)
    cfg = RbfConfig(; kernel = :cubic)
    add_objective!(m, F1; model_cfg = cfg)
    add_objective!(m, F2; model_cfg = cfg)
    m, collect(range(0.15, 0.85; length = n)),
        Dict(:max_iter => 20, :f_tol_rel => 1e-6, :x_tol_rel => 1e-6)
elseif config == "4"
    m = MOP([-4.0, -4.0], [4.0, 4.0])
    add_exact_objective!(m, f1; gradients = g1)
    add_exact_objective!(m, f2; gradients = g2)
    add_ineq_constraint!(m, [1.0 1.0], [1.0])
    add_nl_ineq_constraint!(m, x -> sum(x .^ 2) - 2.25;
                            gradients = x -> 2 .* x)
    m, [-3.0, 2.5], Dict(:max_iter => 25)
elseif config == "ps"
    m = MOP([-4.0, -4.0], [4.0, 4.0])
    add_exact_objective!(m, f1; gradients = g1)
    add_exact_objective!(m, f2; gradients = g2)
    # default budgets: max_ps_problem_evals < 0 -> 500*(n+1) global,
    # ps_polish_algo = nothing -> no polish (descent.jl:414-432)
    m, [-3.0, 2.5], Dict(:max_iter => 8,
                         :descent_method => PascolettiSerafiniConfig(
                             reference_direction = [1.0, 1.0]))
else
    error("unknown CONFIG $(config)")
end

x, fx, code, db, iter_data, filt = optimize(mop, x0; kwargs...)

doc = Dict(
    "config" => config,
    "iterates" => [collect(Float64.(it.x)) for it in db.iter_data],
    "delta" => [Float64(it.Δ) for it in db.iter_data],
    "it_stat" => [string(it.it_stat) for it in db.iter_data],
    "rho" => [Float64(it.ρ) for it in db.iter_data],
    "omega" => [Float64(it.ω) for it in db.iter_data],
    "n_evals" => Morbit.num_evals(mop),
    "stop_code" => string(code),
)

open(out, "w") do io
    JSON.print(io, doc)
end
println("wrote ", out)
