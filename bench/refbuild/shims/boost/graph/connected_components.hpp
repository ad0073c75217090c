// connected_components for the gam-merge reference build.  BGL
// semantics: DFS over vertices 0..n-1; component indices assigned in
// root-discovery order (vertex order), so component numbering is
// deterministic and matches real BGL on the same adjacency structure.
// The component map is any random-access pointer/array (&vec[0], as
// PartitionFunctions.cc:271 passes).

#ifndef GAM_SHIM_BOOST_CONNECTED_COMPONENTS_HPP
#define GAM_SHIM_BOOST_CONNECTED_COMPONENTS_HPP

#include <vector>

#include <boost/graph/adjacency_list.hpp>

namespace boost {

template <class G, class CompMap>
int connected_components(const G& g, CompMap comp) {
  std::size_t n = g.m_out.size();
  std::vector<char> seen(n, 0);
  int c = 0;
  std::vector<std::size_t> stack;
  for (std::size_t r = 0; r < n; ++r) {
    if (seen[r]) continue;
    stack.push_back(r);
    seen[r] = 1;
    while (!stack.empty()) {
      std::size_t u = stack.back();
      stack.pop_back();
      comp[u] = c;
      typedef typename std::map<std::size_t, int>::const_iterator It;
      for (It it = g.m_out[u].begin(); it != g.m_out[u].end(); ++it) {
        if (!seen[it->first]) {
          seen[it->first] = 1;
          stack.push_back(it->first);
        }
      }
    }
    ++c;
  }
  return c;
}

}  // namespace boost

#endif
