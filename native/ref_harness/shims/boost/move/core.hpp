/* shim: boost.move C++11 emulation — rvalue-reference macros map to
 * plain C++11 move semantics */
#pragma once
#include <utility>
namespace boost { using std::move; }
#define BOOST_RV_REF(TYPE) TYPE&&
#define BOOST_MOVE_BASE(BASE, ARG) static_cast<BASE&&>(ARG)
#define BOOST_MOVABLE_BUT_NOT_COPYABLE(TYPE) \
public: \
    TYPE(const TYPE&) = delete; \
    TYPE& operator=(const TYPE&) = delete; \
private:
