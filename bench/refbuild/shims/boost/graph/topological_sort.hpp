// topological_sort + not_a_dag for the gam-merge reference build.
// BGL semantics: DFS over vertices 0..n-1 (as roots, in order),
// out-edges in adjacency-list order (ascending target under setS);
// each vertex is emitted through the output iterator at FINISH time
// (so the result is reverse-topological, exactly like BGL — callers
// that want forward order use front_inserter); a back edge throws
// not_a_dag.

#ifndef GAM_SHIM_BOOST_TOPOLOGICAL_SORT_HPP
#define GAM_SHIM_BOOST_TOPOLOGICAL_SORT_HPP

#include <stdexcept>
#include <vector>

#include <boost/graph/adjacency_list.hpp>

namespace boost {

struct not_a_dag : public std::invalid_argument {
  not_a_dag() : std::invalid_argument("The graph must be a DAG.") {}
};

namespace detail {
template <class G, class Out>
void topo_dfs(const G& g, std::size_t u, std::vector<char>& color,
              Out& out) {
  color[u] = 1;  // grey
  typedef typename std::map<std::size_t, int>::const_iterator It;
  for (It it = g.m_out[u].begin(); it != g.m_out[u].end(); ++it) {
    std::size_t v = it->first;
    if (color[v] == 1) throw not_a_dag();
    if (color[v] == 0) topo_dfs(g, v, color, out);
  }
  color[u] = 2;  // black
  *out++ = u;
}
}  // namespace detail

template <class G, class Out>
void topological_sort(const G& g, Out out) {
  std::vector<char> color(g.m_out.size(), 0);
  for (std::size_t u = 0; u < g.m_out.size(); ++u)
    if (color[u] == 0) detail::topo_dfs(g, u, color, out);
}

}  // namespace boost

#endif
